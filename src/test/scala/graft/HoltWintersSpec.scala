package graft

import graft.operators.HoltWinters

/** [[HoltWinters.smooth]] vs a local sequential replay: randomized multi-key
  * series (the partition fold must reset state at key boundaries), the
  * missing-history convention (seasonal reads 0 for the first period), and
  * the ring's wrap behavior past several periods.
  */
class HoltWintersSpec extends SparkSpec {

  private def local(vs: Seq[Long], m: Int): Seq[(Long, Long, Long, Long)] = {
    var l = 0L; var b = 0L
    val ring = Array.fill(m)(0L)
    vs.zipWithIndex.map { case (v, i) =>
      val sOld = ring(i % m)
      if (i == 0) { l = v; b = 0L }
      else {
        val lPrev = l
        l = ((v - sOld) + 4L * (l + b)) / 5L
        b = ((l - lPrev) + 9L * b) / 10L
      }
      val sNew = ((v - l) + 3L * sOld) / 4L
      ring(i % m) = sNew
      (l, b, sNew, l + b + ring((i + 1) % m))
    }
  }

  test("distributed fold ≡ local replay on randomized multi-key series") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val keys = Seq("a", "b", "c")
    val data = for {
      k <- keys; t <- 1L to 40L
    } yield (k, t, (rnd.nextInt(2000) - 500).toLong)
    val got = HoltWinters.smooth(data.toDF("k", "t", "v"), period = 7)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val want = keys.flatMap { k =>
      val vs = data.filter(_._1 == k).sortBy(_._2)
      vs.map(_._3).zip(local(vs.map(_._3), 7)).zip(vs.map(_._2)).map {
        case ((v, (l, b, s, f)), t) => (k, t, v, l, b, s, f)
      }
    }
    assert(got == want)
  }

  test("streamed Holt-Winters equals the batch fold at sf0.001") {
    import spark.implicits._
    val batch = SparkEntry.queries("holt_winters_additive")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val streamed = SparkEntry.queries("streaming_holt_winters")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(batch.nonEmpty && streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("a seasonal series converges to a nonzero seasonal profile") {
    import spark.implicits._
    // weekly sawtooth: day-of-week d contributes +100·d around a base
    val data = (0L until 70L).map(t => ("s", t, 1000L + 100L * (t % 7)))
    val out = HoltWinters.smooth(data.toDF("k", "t", "v"), period = 7)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    val lastWeek = out.takeRight(7)
    // the seasonal component must separate the weekday levels (monotone in
    // day-of-week for this sawtooth) and be genuinely nonzero
    val seasonals = lastWeek.sortBy(_._2 % 7).map(_._6)
    assert(seasonals.distinct.length > 3, seasonals.toSeq.toString)
    assert(seasonals.last > seasonals.head, seasonals.toSeq.toString)
  }
}
