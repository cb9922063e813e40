package graft

import graft.streaming.{OffsetTracker, ShardEvent, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Cross-micro-batch state semantics of the offset tracker: the per-shard
  * consumed count must carry over between batches (the reference's Flink
  * ValueState surviving across poll cycles). */
class StreamingSpec extends SparkSpec {

  test("offset tracker state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[ShardEvent]
    val tracked = OffsetTracker.track(input.toDS(), Map("a" -> 3L))
    val q = tracked.writeStream.format("memory").queryName("offsets_t")
      .outputMode("append").start()
    // batch 1: shard a rows 1..2 (seq 1,2 <= stored offset 3 -> suppressed),
    //          shard b rows (no stored offset -> all emitted)
    input.addData(ShardEvent("a", 101), ShardEvent("a", 100), ShardEvent("b", 500))
    q.processAllAvailable()
    // batch 2: shard a rows 3..4 -> seq 3 suppressed, seq 4 emitted
    input.addData(ShardEvent("a", 103), ShardEvent("a", 102))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_id, event_type, seq FROM offsets_t")
      .as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(rows == Set((500L, "b", 1L), (103L, "a", 4L)))
  }

  test("staged stream ingest equals its batch input") {
    import spark.implicits._
    val (src, out, ck) = Streams.workDirs("spec_ingest")
    val input = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val staged = Streams.stagedStream(input, src, nFiles = 3)
    val back = Streams.runAppend(staged, out, ck)
    assert(back.as[(Long, String)].collect().toSet ==
      (1 to 100).map(i => (i.toLong, s"v$i")).toSet)
  }
}
