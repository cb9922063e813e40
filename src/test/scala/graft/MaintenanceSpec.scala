package graft

import graft.sinks.{GraftTableWriter, VersionedTable}

/** Selective binpack compaction ([[VersionedTable.compactSmall]]): only
  * small-dir debris is rewritten, healthy dirs survive byte-identically,
  * sub-threshold situations are no-ops, and MOR tables are refused.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def parquetBytes(dir: java.io.File): Map[String, Long] =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap

  test("compactSmall rewrites only the debris; the healthy dir survives byte-identical") {
    val p = "/tmp/graft_tables/spec_binpack"
    GraftTableWriter.drop(spark, p)
    VersionedTable.append((0L until 5000L).map(i => (i, s"v$i")).toDF("id", "v"), p)
    for (i <- 0L until 4L)
      VersionedTable.append(Seq((5000L + i, "small")).toDF("id", "v"), p)
    val snapBefore = VersionedTable.readManifestForTest(spark, p, 5)
    val bigDir = snapBefore.dirs.head
    val bigFiles = parquetBytes(new java.io.File(p, bigDir))

    val v = VersionedTable.compactSmall(spark, p, smallThresholdRows = 100,
      targetRowsPerFile = 1000)
    assert(v == 6)
    val snap = VersionedTable.readManifestForTest(spark, p, 6)
    assert(snap.dirs.size == 2, s"want [healthy, merged], got ${snap.dirs}")
    assert(snap.dirs.head == bigDir, "healthy dir must be carried, not rewritten")
    assert(parquetBytes(new java.io.File(p, bigDir)) == bigFiles,
      "healthy dir files changed")
    val got = VersionedTable.read(spark, p).as[(Long, String)].collect().toSet
    val want = (0L until 5000L).map(i => (i, s"v$i")).toSet ++
      (0L until 4L).map(i => (5000L + i, "small"))
    assert(got == want)
    // one merged dir (4 rows) is still < threshold, but a single small dir
    // is nothing to binpack: no-op, no new version
    assert(VersionedTable.compactSmall(spark, p, 100, 1000) == 6)
    assert(VersionedTable.versions(spark, p).last == 6)
  }

  test("readAsOf pins the snapshot current at a wall-clock instant") {
    val p = "/tmp/graft_tables/spec_asof_ts"
    GraftTableWriter.drop(spark, p)
    VersionedTable.overwrite(Seq((1L, "a")).toDF("id", "v"), p)
    Thread.sleep(200)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(200)
    VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), p)
    assert(VersionedTable.versionAsOf(spark, p, betweenCommits) == 1)
    assert(VersionedTable.readAsOf(spark, p, betweenCommits)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    assert(VersionedTable.versionAsOf(spark, p, System.currentTimeMillis()) == 2)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.versionAsOf(spark, p, 0L) // predates all retained history
    }
    assert(e.getMessage.contains("no snapshot"))
  }

  test("compactSmall refuses a table with outstanding MOR deletes") {
    val p = "/tmp/graft_tables/spec_binpack_mor"
    GraftTableWriter.drop(spark, p)
    VersionedTable.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), p)
    VersionedTable.upsertMor(Seq((2L, "B")).toDF("id", "v"), p, Seq("id"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.compactSmall(spark, p, 100, 1000)
    }
    assert(e.getMessage.contains("compactSmall"))
  }
}
