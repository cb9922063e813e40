package graft

import graft.streaming.{BurstGate, CepOneOrMore, HoltWintersStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Provider matrix for the r11 stateful additions (VERDICT r11 "Next round"
  * #8): BurstGate, CepOneOrMore and HoltWintersStream prove their contracts
  * in their own specs on the DEFAULT (on-heap HDFS-backed) state store; this
  * re-runs one load-bearing cross-batch scenario per operator on the
  * RocksDB provider — the 100 TB state path — and requires (a) the outputs
  * to be IDENTICAL to the default-provider run of the same scenario, and
  * (b) RocksDB to have actually engaged (its custom metrics present). Any
  * accidental dependence on on-heap state semantics (reference sharing,
  * eviction timing) shows up as a diff here.
  */
class RocksDbMatrixSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `scenario` (build stream → (query, collect)) under a provider;
    * returns (rows, rocksdbEngaged). */
  private def withProvider[T](provider: Option[String])(body: => (StreamingQuery, () => Seq[T])): (Seq[T], Boolean) = {
    val prev = spark.conf.getOption(ProviderKey)
    provider.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
    try {
      val (q, collect) = body
      q.processAllAvailable()
      val engaged = {
        import scala.jdk.CollectionConverters._
        val ops = q.lastProgress.stateOperators
        ops.nonEmpty && ops.head.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb"))
      }
      val rows = collect()
      q.stop(); q.awaitTermination()
      (rows, engaged)
    } finally prev.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
  }

  private var n = 0
  private def sinkName(tag: String): String = { n += 1; s"rocks_matrix_${tag}_$n" }

  test("BurstGate flags identically on RocksDB (cross-batch run state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def scenario(): (MemoryStream[(Long, Long, Long)], DataFrame) = {
      val in = MemoryStream[(Long, Long, Long)]
      val df = in.toDF().toDF("user_id", "us", "event_id")
      (in, BurstGate.flags(df, gapUs = 10L, flagAt = 3L).toDF())
    }
    def run(p: Option[String]): (Seq[(Long, Long, Long)], Boolean) =
      withProvider(p) {
        val (in, out) = scenario()
        val name = sinkName("burst")
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        // run builds ACROSS batches: 2 sub-gap events, then the 3rd lands in
        // a later micro-batch — the flag only fires if state carried
        in.addData((1L, 0L, 1L), (1L, 5L, 2L))
        q.processAllAvailable()
        in.addData((1L, 9L, 3L), (1L, 100L, 4L), (1L, 104L, 5L))
        q.processAllAvailable()
        in.addData((1L, 108L, 6L))
        (q, () => spark.table(name)
          .as[(Long, Long, Long)].collect().toSeq.sorted)
      }
    val (defRows, _) = run(None)
    val (rocksRows, engaged) = run(Some(RocksDb))
    assert(engaged, "RocksDB did not engage")
    assert(defRows == Seq((1L, 0L, 9L), (1L, 100L, 108L)), defRows.toString)
    assert(rocksRows == defRows)
  }

  test("CepOneOrMore matches identically on RocksDB (open pairs carry)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(p: Option[String]): (Seq[(Long, Long, Long, Long)], Boolean) =
      withProvider(p) {
        val in = MemoryStream[(Long, Long, Long, String)]
        val df = in.toDF().toDF("user_id", "us", "event_id", "event_type")
        val out = CepOneOrMore.matches(df, windowUs = 1000L).toDF()
        val name = sinkName("cep")
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        // the greedy group opens in batch 1, absorbs + closes in batch 2
        in.addData((1L, 0L, 1L, "view"), (1L, 5L, 2L, "click"))
        q.processAllAvailable()
        in.addData((1L, 8L, 3L, "click"), (1L, 10L, 4L, "purchase"))
        (q, () => spark.table(name)
          .as[(Long, Long, Long, Long)].collect().toSeq.sorted)
      }
    val (defRows, _) = run(None)
    val (rocksRows, engaged) = run(Some(RocksDb))
    assert(engaged, "RocksDB did not engage")
    assert(defRows == Seq((1L, 0L, 10L, 2L)), defRows.toString)
    assert(rocksRows == defRows)
  }

  test("HoltWintersStream smooths identically on RocksDB (seasonal ring carries)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(p: Option[String]): (Seq[(String, Long, Long, Long, Long, Long, Long)], Boolean) =
      withProvider(p) {
        val in = MemoryStream[(String, Long, Long)]
        val df = in.toDF().toDF("k", "t", "v")
        val out = HoltWintersStream.smoothed(df, period = 3).toDF()
        val name = sinkName("hw")
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        // two seasonal cycles split mid-ring across micro-batches: the ring
        // slot written in batch 1 is read back (sOld) in batch 2
        in.addData(("a", 1L, 100L), ("a", 2L, 220L))
        q.processAllAvailable()
        in.addData(("a", 3L, 90L), ("a", 4L, 130L), ("a", 5L, 250L), ("a", 6L, 95L))
        (q, () => spark.table(name)
          .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted)
      }
    val (defRows, _) = run(None)
    val (rocksRows, engaged) = run(Some(RocksDb))
    assert(engaged, "RocksDB did not engage")
    // independent expectation: the pure step() fold (no Spark state at all)
    var st: Option[HoltWintersStream.WState] = None
    val expected = Seq((1L, 100L), (2L, 220L), (3L, 90L), (4L, 130L), (5L, 250L), (6L, 95L))
      .map { case (t, v) =>
        val next = HoltWintersStream.step(st, v, 3)
        st = Some(next)
        val sNew = next.ring(((next.i - 1L) % 3L).toInt)
        val sNext = next.ring((next.i % 3L).toInt)
        ("a", t, v, next.level, next.trend, sNew, next.level + next.trend + sNext)
      }
    assert(defRows == expected, s"$defRows vs $expected")
    assert(rocksRows == defRows)
  }
}
