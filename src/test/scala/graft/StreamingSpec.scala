package graft

import graft.streaming.{OffsetTracker, ShardEvent, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{count, lit, window}
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

  test("watermark drops late rows AND the drop count is observable (ops metrics)") {
    // Late-data accounting: rows behind the watermark must (a) not reach the
    // sink and (b) be COUNTED — silent late-drop is how a 100 TB streaming
    // pipeline loses data invisibly. numRowsDroppedByWatermark in the query
    // progress is the Spark-native meter; this pins both halves.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDS().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("late_metrics_t")
      .outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    input.addData((t(0), 1L), (t(5), 2L))   // window [10:00,10:10)
    q.processAllAvailable()
    input.addData((t(50), 3L))              // advances watermark to 10:40
    q.processAllAvailable()
    input.addData((t(1), 4L))               // LATE: behind the watermark
    q.processAllAvailable()
    input.addData((t(59), 5L))              // closes nothing more, flushes progress
    q.processAllAvailable()
    val dropped = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    q.stop()
    val rows = spark.sql("SELECT ws, n FROM late_metrics_t")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(dropped == 1L, s"expected exactly the one late row counted, got $dropped")
    // the late row never reached the emitted closed window
    assert(rows(t(0)) == 2L, s"late row leaked into the closed window: $rows")
  }

  test("ProcessingTime ingest survives a kill/restart exactly-once (offset tracker included)") {
    import spark.implicits._
    val (src, out, ck) = Streams.workDirs("spec_restart")
    // Stage 6 single-file slices so maxFilesPerTrigger=1 yields 6 micro-batches.
    val slices = (0 until 6).map { s =>
      (1 to 50).map(i => ShardEvent(if (i % 2 == 0) "a" else "b", (s * 50 + i).toLong))
    }
    slices.foreach(rows => rows.toDF().coalesce(1).write.mode("append").parquet(src))
    val storedOffsets = Map("a" -> 10L) // first 10 'a' rows already consumed upstream

    def tracked() = {
      val staged = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      OffsetTracker.track(staged.as[ShardEvent], storedOffsets).toDF()
    }

    // Run 1: continuous processing-time trigger, killed mid-backlog. The
    // 400 ms interval leaves a wide window to stop before the backlog drains.
    val q1 = Streams.startProcessingTime(tracked(), out, ck, intervalMs = 400)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (q1.recentProgress.map(_.numInputRows).sum < 100 && System.nanoTime() < deadline)
      Thread.sleep(50)
    q1.stop() // kill with backlog remaining
    q1.awaitTermination()
    assert(q1.recentProgress.map(_.numInputRows).sum < 300, "kill happened after full drain; test is vacuous")

    // Run 2: same checkpoint + sink — must resume, not restart from scratch.
    val q2 = Streams.startProcessingTime(tracked(), out, ck, intervalMs = 50)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()

    val got = spark.read.parquet(out).as[(Long, String, Long)].collect().toSeq
    // No duplicates across the restart boundary…
    assert(got.map(_._1).distinct.size == got.size, "duplicate event_ids across restart")
    // …no loss: every row past each shard's stored offset is present exactly once,
    // with contiguous per-shard sequence numbers picking up beyond the offset.
    val perShardSeqs = got.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    assert(perShardSeqs("a") == (11L to 150L), "shard a: expected seqs 11..150")
    assert(perShardSeqs("b") == (1L to 150L), "shard b: expected seqs 1..150")
    val expectedIds = slices.flatten.filter(_.event_type == "b").map(_.event_id).toSet ++
      slices.flatten.filter(_.event_type == "a").map(_.event_id).toSet // ids only suppressed by seq, checked via counts
    assert(got.map(_._1).toSet.subsetOf(expectedIds))
  }

  test("ProcessingTime + appendOnce: crash between table commit and checkpoint commit, no duplicates") {
    import graft.sinks.VersionedTable
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // The composed exactly-once contract: a ProcessingTime-triggered query
    // writing through VersionedTable.appendOnce is killed in the WORST window
    // — after the sink's atomic manifest commit for a batch, before Spark
    // writes that batch to the checkpoint commit log. On restart the batch IS
    // redelivered (at-least-once foreachBatch), and only the batch-id-in-
    // manifest check keeps the replay from doubling the rows.
    val (src, out, ck) = Streams.workDirs("spec_appendonce_crash")
    val tbl = s"$out/table"
    val slices = (0 until 4).map(s => (1 to 25).map(i => ((s * 25 + i).toLong, s"v${s * 25 + i}")))
    slices.foreach(rows => rows.toDF("id", "v").coalesce(1).write.mode("append").parquet(src))
    def staged() = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    @volatile var crashedAfterCommit = false
    def start(crash: Boolean) = staged().writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = VersionedTable.appendOnce(batch, tbl, batchId)
        if (crash && batchId == 1) {
          assert(applied, "batch 1 replayed before any crash")
          crashedAfterCommit = true
          throw new RuntimeException("injected crash: table committed, checkpoint not")
        }
        ()
      }
      .start()

    val q1 = start(crash = true)
    try q1.awaitTermination(30000) catch {
      case _: org.apache.spark.sql.streaming.StreamingQueryException => // expected: the injected crash
    }
    assert(crashedAfterCommit, "injected crash never fired (batch 1 not reached)")
    // The sink table already holds batch 1's rows; the checkpoint does not.
    assert(VersionedTable.read(spark, tbl).count() == 50L)

    // Restart against the same checkpoint: batch 1 is redelivered, appendOnce
    // must recognize it (lastBatch >= 1) and skip; batches 2..3 then apply.
    val q2 = start(crash = false)
    q2.processAllAvailable()
    q2.stop(); q2.awaitTermination()
    val got = VersionedTable.read(spark, tbl).as[(Long, String)].collect().toSeq
    assert(got.map(_._1).distinct.size == got.size, "duplicate ids across crash-replay boundary")
    assert(got.toSet == slices.flatten.toSet)
  }

  test("streaming state is queryable offline through the state-store reader") {
    // Flink exposes queryable state only through a live job; Structured
    // Streaming's checkpoint is itself a table — the `statestore` data
    // source reads any operator's keyed state OFFLINE. Operationally this
    // is how a stuck 100 TB pipeline is debugged (inspect the offsets
    // without touching the job) and how state is audited after a crash.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (_, _, ck) = Streams.workDirs("spec_state_reader")
    val input = MemoryStream[ShardEvent]
    val tracked = OffsetTracker.track(input.toDS(), Map.empty)
    val q = tracked.writeStream.format("memory").queryName("state_reader_t")
      .option("checkpointLocation", ck).outputMode("append").start()
    input.addData(ShardEvent("a", 1), ShardEvent("a", 2), ShardEvent("b", 10))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val state = spark.read.format("statestore").load(ck)
      .selectExpr("to_json(key) AS k", "to_json(value) AS v")
      .as[(String, String)].collect().toSeq
    assert(state.size == 2, state.toString)
    val byShard = state.map { case (k, v) => (k.contains("\"a\""), v) }.toMap
    assert(byShard(true).contains("2"), s"shard a consumed=2: $state")
    assert(byShard(false).contains("1"), s"shard b consumed=1: $state")
  }

  test("custom keyed state runs unchanged on the RocksDB state store") {
    // The 100 TB state path: the default HDFS-backed store keeps every
    // partition's state deserialized on-heap, so keyed state is bounded by
    // executor memory; RocksDBStateStoreProvider spills to local SST files
    // and bounds only the working set. Same OffsetTracker scenario as the
    // first spec — the state contract must be provider-agnostic — plus an
    // assertion that RocksDB really engaged (its custom metrics appear).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[ShardEvent]
      val tracked = OffsetTracker.track(input.toDS(), Map("a" -> 3L))
      val q = tracked.writeStream.format("memory").queryName("offsets_rocks")
        .outputMode("append").start()
      input.addData(ShardEvent("a", 101), ShardEvent("a", 100), ShardEvent("b", 500))
      q.processAllAvailable()
      input.addData(ShardEvent("a", 103), ShardEvent("a", 102))
      q.processAllAvailable()
      val stateOps = q.lastProgress.stateOperators
      val rocksEngaged = stateOps.nonEmpty && {
        import scala.jdk.CollectionConverters._
        stateOps.head.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb"))
      }
      val rows = spark.sql("SELECT event_id, event_type, seq FROM offsets_rocks")
        .as[(Long, String, Long)].collect().toSet
      q.stop()
      assert(rocksEngaged, "RocksDB state store did not engage (no rocksdb* metrics)")
      assert(rows == Set((500L, "b", 1L), (103L, "a", 4L)))
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
