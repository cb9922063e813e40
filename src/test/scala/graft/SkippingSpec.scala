package graft

import graft.sinks.{GraftTableWriter, VersionedTable}
import org.apache.spark.sql.functions._

/** Data-skipping structures beyond min/max bounds: per-dir bloom sidecars
  * ([[VersionedTable.appendWithBloom]]/[[VersionedTable.readPoint]]) and
  * mixed-spec pruning across a partition-spec evolution. Both must be
  * superset-safe (never drop a dir that could hold a match) and effective
  * (provably skip dirs on the happy path).
  */
class SkippingSpec extends SparkSpec {
  import spark.implicits._

  test("bloom sidecars: point lookups are exact and skip absent dirs") {
    val p = "/tmp/graft_tables/spec_bloom"
    GraftTableWriter.drop(spark, p)
    val rows = (0L until 4000L).map(i => (i, s"v$i")).toDF("id", "v")
    for (b <- 0L until 4L)
      VersionedTable.appendWithBloom(rows.filter($"id" % 4 === b), p, "id")

    // every dir spans the full id range: min/max bounds could prune NOTHING
    val snap = VersionedTable.readManifestForTest(spark, p, 4)
    assert(snap.dirs.size == 4)

    // exactness: each probed key returns exactly its row
    for (k <- Seq(0L, 17L, 1234L, 3999L)) {
      val got = VersionedTable.readPoint(spark, p, "id", k)
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((k, s"v$k")), s"lookup $k")
    }
    // effectiveness: the true dir always survives, most others are skipped
    // (fpp 1% x 3 other dirs -> overwhelmingly 1 kept dir per key)
    val keptCounts = (0L until 100L).map(k =>
      VersionedTable.bloomKeptDirs(spark, p, "id", k).size)
    assert(keptCounts.forall(_ >= 1))
    assert(keptCounts.sum <= 150, s"bloom barely pruned: $keptCounts")

    // absence: a key no dir holds yields zero rows (false positives may
    // open a dir, never emit a row)
    assert(VersionedTable.readPoint(spark, p, "id", 999999L).count() == 0)
  }

  test("hidden partitioning: transform bounds prune, the column never reaches the data") {
    val p = "/tmp/graft_tables/spec_hidden"
    GraftTableWriter.drop(spark, p)
    val rows = (0L until 1000L).map(i => (i, i / 100L)).toDF("id", "bucketSrc")
      .select($"id") // the transform source is derived, not stored
    for (b <- 0L until 10L)
      VersionedTable.appendWithHiddenStats(
        rows.filter(expr("id div 100") === b), p, "id_bucket", expr("id div 100"))
    // the transform column is in NO data file's schema
    assert(VersionedTable.read(spark, p).columns.toSeq == Seq("id"))
    // a base-column range translates to bucket bounds and prunes exactly
    val snap = VersionedTable.readManifestForTest(spark, p, 10)
    val kept = VersionedTable.prunedDirs(snap,
      Seq(VersionedTable.LongRange("id_bucket", 250L / 100L, 420L / 100L)))
    assert(kept.size == 3, s"want the 3 dirs of buckets 2..4, got ${kept.size}")
    val got = VersionedTable.readPruned(spark, p,
        Seq(VersionedTable.LongRange("id_bucket", 250L / 100L, 420L / 100L)))
      .filter($"id" >= 250L && $"id" <= 420L)
      .as[Long].collect().toSet
    assert(got == (250L to 420L).toSet)
    // name collision with a data column is refused
    val e = intercept[IllegalArgumentException] {
      VersionedTable.appendWithHiddenStats(rows, p, "id", ($"id" / 100L).cast("long"))
    }
    assert(e.getMessage.contains("collides"))
  }

  test("partition evolution: mixed-spec scans prune the new era, read the old, stay exact") {
    val p = "/tmp/graft_tables/spec_part_evo"
    GraftTableWriter.drop(spark, p)
    val rows = (0L until 2000L).map(i => (i, i % 10, i % 4)).toDF("id", "m", "b")
    for (m <- 0L until 10L) // era 1: partitioned + tracked by m
      VersionedTable.appendWithStats(rows.filter($"id" < 1000L && $"m" === m), p, Seq("m"))
    for (b <- 0L until 4L) // era 2 (spec evolved): partitioned + tracked by b
      VersionedTable.appendWithStats(rows.filter($"id" >= 1000L && $"b" === b), p, Seq("b"))

    val snap = VersionedTable.readManifestForTest(spark, p, 14)
    val kept = VersionedTable.prunedDirs(snap, Seq(VersionedTable.LongRange("b", 2, 2)))
    // all 10 era-1 dirs (no b bounds -> unprunable) + exactly 1 era-2 dir
    assert(kept.size == 11, s"kept ${kept.size} dirs")

    val got = VersionedTable.readPruned(spark, p, Seq(VersionedTable.LongRange("b", 2, 2)))
      .filter($"b" === 2).as[(Long, Long, Long)].collect().toSet
    val want = (0L until 2000L).filter(_ % 4 == 2).map(i => (i, i % 10, i % 4)).toSet
    assert(got == want)
  }
}
