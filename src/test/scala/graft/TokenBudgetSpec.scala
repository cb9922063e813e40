package graft

/** TokenBudget.crossings: once-only crossing across micro-batches, the
  * unknown-source unlimited policy, and the hot-key memory shape (buffered
  * sort only until the crossing; order-free single-pass after).
  */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String, Long, String)]],
      budgets: Map[String, Long]): Seq[(String, Long, Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String)]
    val df = ms.toDF.toDF("doc_id", "source", "n_tokens", "hk")
    val out = graft.streaming.TokenBudget.crossings(df, budgets)
    val q = out.writeStream.format("memory")
      .queryName("tb_out").outputMode("append").start()
    try {
      batches.foreach { b =>
        ms.addData(b: _*)
        q.processAllAvailable()
      }
      spark.table("tb_out")
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
    } finally {
      q.stop(); spark.catalog.dropTempView("tb_out")
    }
  }

  test("exactly one crossing per source, across micro-batch boundaries") {
    // source a: 40+40 in batch 1, crossing 100 with doc 3 (40+40+30=110)
    // in batch 2; later docs never re-emit
    val got = run(Seq(
      Seq((1L, "a", 40L, "h1"), (2L, "a", 40L, "h2")),
      Seq((3L, "a", 30L, "h3"), (4L, "a", 99L, "h4")),
      Seq((5L, "a", 1L, "h5"))),
      Map("a" -> 100L))
    assert(got == Seq(("a", 3L, 110L, 100L)), got.toString)
  }

  test("a source missing from the budget map is unlimited, not a task kill") {
    val got = run(Seq(Seq(
      (1L, "known", 60L, "h1"), (2L, "known", 60L, "h2"),
      (3L, "mystery", 1000000L, "h3"))),
      Map("known" -> 100L))
    assert(got.map(_._1) == Seq("known"), got.toString)
  }

  test("hot key: a 200k-doc single-source batch folds, and post-crossing batches take the order-free path") {
    // one source delivers 200k docs in ONE micro-batch — the skew case the
    // buffered sort must absorb (bounded by the batch slice, not the
    // stream). The crossing lands mid-batch in (hk, doc_id) order.
    val n = 200000
    val batch1 = (1 to n).map(i => (i.toLong, "s", 1L, f"h$i%07d"))
    // after the crossing the fold is a single-pass sum (no buffer): a
    // second hot batch must still emit nothing and keep the cum exact,
    // which the (budget+cum)-sized third batch's absence of output proves
    val batch2 = (n + 1 to 2 * n).map(i => (i.toLong, "s", 1L, f"h$i%07d"))
    val got = run(Seq(batch1, batch2), Map("s" -> 150000L))
    // crossing doc: the 150000th in hk order = doc_id 150000 (hk is
    // zero-padded doc_id here, so the orders agree)
    assert(got == Seq(("s", 150000L, 150000L, 150000L)), got.take(3).toString)
  }
}
