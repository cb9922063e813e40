package graft

import graft.streaming.StreamingAttribution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** StreamingAttribution: cross-batch click state is load-bearing (a click
  * in batch 1 attributes a purchase in batch 3), the lookback bounds it,
  * and a newer click replaces the old one in state.
  */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long, String, Long)]],
      lookbackUs: Long): Seq[(Long, Long, Long, Long, Option[Long], Boolean)] = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Long)]
    val df = ms.toDF.toDF("user_id", "us", "event_id", "event_type", "rev_c")
    val out = StreamingAttribution.attribute(df, lookbackUs)
    val q = out.writeStream.format("memory")
      .queryName("attr_out").outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table("attr_out")
        .as[(Long, Long, Long, Long, Option[Long], Boolean)].collect().toSeq
        .sortBy(_._1)
    } finally {
      q.stop(); spark.catalog.dropTempView("attr_out")
    }
  }

  test("a click two batches earlier attributes; outside the lookback it does not") {
    val day = 86400000000L
    val got = run(Seq(
      Seq((1L, 100L, 1L, "click", 0L)),
      Seq((2L, 200L, 2L, "click", 0L)), // other user: no cross-key bleed
      Seq((1L, 100L + day, 3L, "purchase", 500L),       // within 7d: hit
        (1L, 100L + 10 * day, 4L, "purchase", 700L))),  // past 7d: organic
      lookbackUs = 7 * day)
    assert(got == Seq(
      (3L, 1L, 100L + day, 500L, Some(1L), true),
      (4L, 1L, 100L + 10 * day, 700L, None, false)), got.toString)
  }

  test("a newer click replaces the held one; per-batch reset would misattribute") {
    val got = run(Seq(
      Seq((1L, 100L, 1L, "click", 0L)),
      Seq((1L, 200L, 2L, "click", 0L)),
      Seq((1L, 300L, 3L, "purchase", 900L))),
      lookbackUs = 86400000000L)
    // the purchase must credit click 2 (the latest), held across batches —
    // a per-batch replay with reset state would see NO click in batch 3
    assert(got == Seq((3L, 1L, 300L, 900L, Some(2L), true)), got.toString)
  }

  test("same-microsecond tie resolves by event_id (the oracle's order)") {
    val got = run(Seq(Seq(
      (1L, 500L, 10L, "click", 0L),
      (1L, 500L, 11L, "purchase", 100L),  // click id 10 < 11: attributed
      (1L, 500L, 12L, "click", 0L),
      (1L, 400L, 5L, "purchase", 50L))),  // before any click: organic
      lookbackUs = 86400000000L)
    assert(got == Seq(
      (5L, 1L, 400L, 50L, None, false),
      (11L, 1L, 500L, 100L, Some(10L), true)), got.toString)
  }
}
