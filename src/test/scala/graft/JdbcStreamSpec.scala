package graft

import graft.sinks.VersionedTable
import graft.streaming.JdbcPollStream
import org.apache.spark.sql.{SaveMode, DataFrame}
import org.apache.spark.sql.functions._

/** [[JdbcPollStream]] — the reference deployment running AS a stream —
  * under the failure modes the registered query does not inject:
  * crash BEFORE the sink commit (at-least-once redelivery must re-poll the
  * same offsets and commit once), a HARD KILL with a cold restart (fresh
  * runUntilDrained call over the same checkpoint + table), and the
  * offset-recovery invariant itself (committed per-shard counts ≡ offsets).
  * The registered `streaming_jdbc_ingest` covers crash-AFTER-commit (batch
  * id replayed and refused) plus live shard re-discovery.
  */
class JdbcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(name: String): (String, String) = {
    val base = s"/tmp/graft_stream/jdbc_spec_$name"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    (s"$base/table", s"$base/ck")
  }

  /** Two shards × 25 rows each, ordered by `ord`. */
  private def stage(url: String): DataFrame = {
    val df = (for { sh <- Seq("a", "b"); i <- 1 to 25 }
      yield (sh, i.toLong)).toDF("shard", "ord")
    df.write.format("jdbc").option("url", url).option("dbtable", "t")
      .option("createTableColumnTypes", "shard VARCHAR(32)")
      .mode(SaveMode.Overwrite).save()
    df
  }

  private def cfg(url: String, tablePath: String, ck: String): JdbcPollStream.Config =
    JdbcPollStream.Config(url = url, table = "t", shardCol = "shard",
      sortCols = Seq("ord"), pageSize = 10L, tablePath = tablePath,
      checkpointDir = ck)

  /** Ground truth with the page→cycle map: cycle = (rank-1)/10 + 1. */
  private def expected: Seq[(String, Long, Long)] =
    for { sh <- Seq("a", "b"); i <- 1 to 25 }
      yield (sh, i.toLong, ((i - 1) / 10 + 1).toLong)

  private def readBack(tablePath: String): Seq[(String, Long, Long)] =
    VersionedTable.read(spark, tablePath)
      .select($"shard", $"ord", $"cycle")
      .as[(String, Long, Long)].collect().sorted.toSeq

  test("clean run drains with exact page boundaries; offsets ≡ committed counts") {
    val url = "jdbc:derby:memory:jps_clean;create=true"
    val (table, ck) = freshDirs("clean")
    stage(url)
    JdbcPollStream.runUntilDrained(spark, cfg(url, table, ck))
    assert(readBack(table) == expected.sorted)
    // one commit per non-empty cycle: 3 pages per shard, aligned cycles
    assert(VersionedTable.versions(spark, table).size == 3)
    // the recovery invariant: committed per-shard counts ARE the offsets
    assert(JdbcPollStream.committedOffsets(spark, table, "shard") ==
      Map("a" -> 25L, "b" -> 25L))
  }

  test("crash BEFORE the sink commit: redelivery re-polls the same offsets, commits once") {
    val url = "jdbc:derby:memory:jps_precrash;create=true"
    val (table, ck) = freshDirs("precrash")
    stage(url)
    @volatile var crashed = false
    JdbcPollStream.runUntilDrained(spark, cfg(url, table, ck).copy(
      beforeCommit = { cycle =>
        if (cycle == 2L && !crashed) {
          crashed = true
          throw new RuntimeException("injected crash: before sink commit")
        }
      }))
    assert(crashed)
    // the redelivered batch re-derived offsets from committed data (cycle 1
    // only) and committed cycle 2 exactly once — no gap, no duplicate
    assert(readBack(table) == expected.sorted)
    assert(VersionedTable.versions(spark, table).size == 3)
  }

  test("hard kill + cold restart: a fresh run over the same checkpoint finishes exactly-once") {
    val url = "jdbc:derby:memory:jps_kill;create=true"
    val (table, ck) = freshDirs("kill")
    stage(url)
    // process death modeled as restarts EXHAUSTED mid-run: the crash at
    // cycle 2 propagates out of runUntilDrained (maxRestarts = 0), leaving
    // a committed prefix + a checkpoint, like a killed driver would
    @volatile var crashed = false
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      JdbcPollStream.runUntilDrained(spark, cfg(url, table, ck).copy(
        maxRestarts = 0,
        afterCommit = { cycle =>
          if (cycle == 2L && !crashed) {
            crashed = true
            throw new RuntimeException("injected kill: after sink commit")
          }
        }))
    }
    val committedAtKill = VersionedTable.versions(spark, table).size
    assert(committedAtKill >= 2, s"kill left $committedAtKill commits")
    // cold restart: a brand-new run (fresh driver state, same dirs) must
    // refuse the replayed batch id, re-derive offsets, and finish exact
    JdbcPollStream.runUntilDrained(spark, cfg(url, table, ck))
    assert(readBack(table) == expected.sorted)
    assert(VersionedTable.versions(spark, table).size == 3)
  }

  test("timestamp+incrementing stream captures a LIVE same-timestamp race (r15)") {
    // the composite CDC mode under ProcessingTime: rows committing AT the
    // high-watermark timestamp with higher ids, injected mid-stream after
    // the first committed cycle — the `timestamp`-only predicate would
    // never see them; the (ts, id) lexicographic watermark must pull
    // exactly them and then drain quiescent
    val url = "jdbc:derby:memory:jps_race;create=true"
    val (table, ck) = freshDirs("race")
    // 20 rows sharing TWO timestamps (10, 20) — collisions by construction
    val base = (1 to 20).map(i => (i.toLong, if (i <= 10) 10L else 20L, i * 7L))
    base.toDF("id", "ts", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "t")
      .mode(SaveMode.Overwrite).save()
    @volatile var injected = false
    JdbcPollStream.runCdcUntilDrained(spark, JdbcPollStream.CdcConfig(
      url = url, table = "t", keys = Seq("id"), tsCol = "ts",
      tablePath = table, checkpointDir = ck, incCol = Some("id"),
      afterCommit = { cycle =>
        if (cycle == 1L && !injected) {
          injected = true
          // the race: ids 21..25 land AT the watermark timestamp (20)
          (21 to 25).map(i => (i.toLong, 20L, i * 7L)).toDF("id", "ts", "v")
            .write.format("jdbc").option("url", url).option("dbtable", "t")
            .mode(SaveMode.Append).save()
        }
      }))
    assert(injected, "the race must have been staged after cycle 1")
    val got = VersionedTable.read(spark, table)
      .select($"id", $"ts", $"v").as[(Long, Long, Long)].collect().toSet
    val want = (base ++ (21 to 25).map(i => (i.toLong, 20L, i * 7L))).toSet
    assert(got == want, s"raced rows missing or duplicated: got ${got.size}")
    // the derived composite hwm is the lexicographic max
    assert(JdbcPollStream.committedHwmInc(spark, table, "ts", "id") == ((20L, 25L)))
  }

  /** Counts non-marker job starts, then uses one marker job as an ordering
    * barrier: listener delivery is in-order, so once the marker's start has
    * been observed every earlier job start has been delivered too. */
  private def jobsLaunchedBy(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var markerSeen = false
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .map(_.getProperty("spark.job.description")).orNull
        if (desc == "graft-hwm-marker") markerSeen = true
        else jobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      spark.sparkContext.setJobDescription("graft-hwm-marker")
      try spark.range(1).count()
      finally spark.sparkContext.setJobDescription(null)
      val deadline = System.currentTimeMillis() + 30000
      while (!markerSeen && System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(markerSeen, "marker job never observed — listener bus stalled")
      jobs.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("hwm derivation is metadata-only: zero Spark jobs once dirs track the watermark") {
    val (table, _) = freshDirs("hwm_meta")
    // batch 0: plain mode bounds; batch 1 stages the pair trap — the row
    // with the max ts (30) carries a LOW id (3), while the max id (9) sits
    // at ts 25: naive (max ts_hi, max inc_hi) = (30, 9) would overstate
    // the pair and skip raced source rows forever; the exact pair bound is
    // (30, 3).
    assert(VersionedTable.upsertMorOnce(
      Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("id", "ts", "v"),
      table, Seq("id"), 0L,
      statsCols = Seq("ts", "id"), pairCols = Some(("ts", "id"))))
    assert(VersionedTable.upsertMorOnce(
      Seq((3L, 30L, 3L), (9L, 25L, 9L)).toDF("id", "ts", "v"),
      table, Seq("id"), 1L,
      statsCols = Seq("ts", "id"), pairCols = Some(("ts", "id"))))
    var h = 0L
    var hp = (0L, 0L)
    val n = jobsLaunchedBy {
      h = JdbcPollStream.committedHwm(spark, table, "ts")
      hp = JdbcPollStream.committedHwmInc(spark, table, "ts", "id")
    }
    assert(n == 0, s"hwm derivation launched $n Spark jobs; must be manifest-only")
    assert(h == 30L)
    assert(hp == ((30L, 3L)), s"pair hwm must be the exact lexicographic max, got $hp")
    // and both agree with the scan-derived truth
    import org.apache.spark.sql.functions.{max, struct}
    assert(VersionedTable.read(spark, table).agg(max($"ts")).head.getLong(0) == h)
    val r = VersionedTable.read(spark, table)
      .agg(max(struct($"ts", $"id"))).head.getStruct(0)
    assert((r.getLong(0), r.getLong(1)) == hp)
  }

  test("hwm falls back to the scan when a dir is untracked, and stays correct") {
    val (table, _) = freshDirs("hwm_fallback")
    assert(VersionedTable.upsertMorOnce(
      Seq((1L, 10L, 1L)).toDF("id", "ts", "v"), table, Seq("id"), 0L,
      statsCols = Seq("ts"), pairCols = Some(("ts", "id"))))
    // a legacy (non-tracking) writer commits a dir with no bounds
    VersionedTable.upsertMor(
      Seq((2L, 40L, 2L)).toDF("id", "ts", "v"), table, Seq("id"))
    assert(VersionedTable.manifestHwm(spark, table, "ts").isEmpty,
      "an untracked dir must disqualify the metadata path")
    assert(VersionedTable.manifestHwmPair(spark, table, "ts", "id").isEmpty)
    // the public hwm API still answers — via the scan fallback
    assert(JdbcPollStream.committedHwm(spark, table, "ts") == 40L)
    assert(JdbcPollStream.committedHwmInc(spark, table, "ts", "id") == ((40L, 2L)))
  }

  test("empty / absent tables derive MinValue watermarks without scanning") {
    val (table, _) = freshDirs("hwm_empty")
    val n = jobsLaunchedBy {
      assert(JdbcPollStream.committedHwm(spark, table, "ts") == Long.MinValue)
      assert(JdbcPollStream.committedHwmInc(spark, table, "ts", "id") ==
        ((Long.MinValue, Long.MinValue)))
    }
    assert(n == 0, s"absent-table hwm launched $n jobs")
  }
}
