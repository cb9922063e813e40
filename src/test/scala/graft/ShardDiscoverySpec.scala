package graft

import graft.sources.ShardedIngest
import graft.streaming.{OffsetTracker, ShardEvent, Streams}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous shard re-discovery (ColumnSource.java:39-54): the reference
  * re-polls `SELECT DISTINCT shard` in an interval loop forever, so a shard
  * value that first appears AFTER job start still enters the keyed stream
  * and is read from offset 0. Two composed proofs:
  *
  *  1. JDBC poll cycles against live Derby: a shard INSERTed between poll
  *     cycles is discovered by the next `discoverShardsJdbc`, page-read
  *     from offset 0, and the union of all cycles covers every row exactly
  *     once (no loss, no double-read) while pre-existing shards resume
  *     from their advanced offsets.
  *
  *  2. Streaming restart: OffsetTracker under `Trigger.AvailableNow` with a
  *     kill/restart between micro-batches — a shard whose first file lands
  *     while the query is DOWN is picked up on restart with no stored
  *     offset and no state, emits from seq 1, and the pre-existing shard's
  *     numbering continues where its recovered state left off.
  */
class ShardDiscoverySpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_discovery;create=true"

  test("JDBC: shard inserted between poll cycles is discovered and read from offset 0") {
    val sortCols = Seq("event_id")
    val initial = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "alpha"), (4L, "beta"), (5L, "beta"))
      .toDF("event_id", "event_type")
    initial.write.format("jdbc")
      .option("url", url).option("dbtable", "disc_spec")
      .option("createTableColumnTypes", "event_type VARCHAR(32)")
      .mode(SaveMode.Overwrite).save()

    // poll cycle 1: only alpha/beta exist
    val shards1 = ShardedIngest.discoverShardsJdbc(spark, url, "disc_spec", "event_type")
    assert(shards1 == Seq("alpha", "beta"))
    val page1 = ShardedIngest.viaJdbc(spark, url, "disc_spec", "event_type",
      sortCols, Map.empty, pageSize = 2L, shards1)
    val off1 = ShardedIngest.nextOffsets(page1, "event_type", Map.empty)
    assert(off1 == Map("alpha" -> 2L, "beta" -> 2L))

    // a NEW shard value lands between the cycles (the interval-loop case)
    Seq((6L, "gamma"), (7L, "gamma"), (8L, "alpha"))
      .toDF("event_id", "event_type")
      .write.format("jdbc")
      .option("url", url).option("dbtable", "disc_spec")
      .mode(SaveMode.Append).save()

    // poll cycle 2: gamma is discovered; its offset map entry is ABSENT, so
    // the page starts at 0 — no row of the new shard is skipped
    val shards2 = ShardedIngest.discoverShardsJdbc(spark, url, "disc_spec", "event_type")
    assert(shards2 == Seq("alpha", "beta", "gamma"),
      s"new shard not re-discovered: $shards2")
    val page2 = ShardedIngest.viaJdbc(spark, url, "disc_spec", "event_type",
      sortCols, off1, pageSize = 10L, shards2)
    val got2 = page2.select($"event_id").as[Long].collect().toSet
    // alpha resumes past {1,2}; beta (both rows already consumed) yields
    // nothing; gamma reads {6,7} from offset 0
    assert(got2 == Set(3L, 6L, 7L, 8L),
      s"cycle 2 must resume old shards AND read the new shard from 0: $got2")

    // across both cycles: every row exactly once
    val all = page1.select($"event_id").unionByName(page2.select($"event_id"))
      .as[Long].collect().toSeq
    assert(all.sorted == (1L to 8L).toSeq, s"row loss or double-read: $all")
  }

  test("streaming: shard appearing while the query is down is tracked from offset 0 on restart") {
    val base = "/tmp/graft_stream/shard_discovery_spec"
    def rm(p: String): Unit = {
      def go(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(go))
        f.delete(); ()
      }
      go(new java.io.File(p))
    }
    rm(base)
    val (src, out, ck) = (s"$base/src", s"$base/out", s"$base/ck")
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def stage(rows: Seq[(String, Long)], i: Int): Unit = {
      val before = fs.globStatus(new org.apache.hadoop.fs.Path(s"$src/*.parquet")) match {
        case null => Set.empty[String]
        case st   => st.map(_.getPath.toString).toSet
      }
      rows.toDF("event_type", "event_id").coalesce(1)
        .write.mode("append").parquet(src)
      fs.globStatus(new org.apache.hadoop.fs.Path(s"$src/*.parquet"))
        .map(_.getPath).filterNot(p => before(p.toString))
        .foreach(p => fs.setTimes(p, 1700000000000L + i * 60000L, -1))
    }

    def runDrain(): Unit = {
      val staged = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val tracked = OffsetTracker.track(staged.as[ShardEvent],
        initialOffsets = Map("alpha" -> 1L)) // alpha known at start, 1 consumed
      val q = tracked.toDF().writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination()
    }

    // run 1: only alpha exists
    stage(Seq(("alpha", 10L), ("alpha", 11L), ("alpha", 12L)), 0)
    runDrain()
    // the query is DOWN; a brand-new shard's file lands (plus more alpha)
    stage(Seq(("gamma", 20L), ("gamma", 21L), ("alpha", 13L)), 1)
    // restart from the SAME checkpoint: AvailableNow picks up the new file,
    // gamma reaches the tracker with no state and no stored offset
    runDrain()

    val got = spark.read.parquet(out)
      .select($"event_type", $"event_id", $"seq")
      .as[(String, Long, Long)].collect().toSet
    val expected = Set(
      // alpha: stored offset 1 suppresses seq 1 (event 10); state carries
      // across the restart, so event 13 continues at seq 4
      ("alpha", 11L, 2L), ("alpha", 12L, 3L), ("alpha", 13L, 4L),
      // gamma: discovered mid-stream -> offset 0, emitted from seq 1
      ("gamma", 20L, 1L), ("gamma", 21L, 2L))
    assert(got == expected, s"got $got")
    rm(base)
  }
}
