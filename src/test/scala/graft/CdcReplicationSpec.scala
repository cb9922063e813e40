package graft

import graft.sinks.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC pipeline round-trip: the changelog produced by
  * [[VersionedTable.changes]] and consumed by
  * [[VersionedTable.applyChanges]] reproduces every source snapshot on a
  * replica, exactly — inserts, updates, deletes, and a no-op batch.
  */
class CdcReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_tables/spec_$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private def rows(df: DataFrame): Set[(Long, String, Long)] =
    df.select($"k", $"s", $"v").as[(Long, String, Long)].collect().toSet

  test("replaying the changelog reproduces every source version on a replica") {
    val src = fresh("cdc_src")
    val rep = fresh("cdc_rep")
    def t(k: Long, s: String, v: Long) = (k, s, v)
    val v1 = Seq(t(1, "a", 10), t(2, "b", 20), t(3, "c", 30), t(4, "d", 40))
    VersionedTable.overwrite(v1.toDF("k", "s", "v"), src) // v1
    // v2: update k=2, insert k=5
    VersionedTable.upsert(Seq(t(2, "b2", 21), t(5, "e", 50)).toDF("k", "s", "v"),
      src, Seq("k"))
    // v3: delete k=1 and k=3
    VersionedTable.overwrite(
      VersionedTable.read(spark, src).filter($"k" =!= 1 && $"k" =!= 3), src)
    // v4: a NO-OP commit (same contents) — its changelog must be empty and
    // applying it must not disturb the replica
    VersionedTable.overwrite(VersionedTable.read(spark, src), src)

    VersionedTable.overwrite(VersionedTable.readVersion(spark, src, 1), rep)
    assert(rows(VersionedTable.read(spark, rep)) ==
      rows(VersionedTable.readVersion(spark, src, 1)))
    for (v <- 2 to 4) {
      val ch = VersionedTable.changes(spark, src, v - 1, v, Seq("k"))
      if (v == 4) assert(ch.count() == 0, "no-op commit must emit no changes")
      VersionedTable.applyChanges(ch, rep, Seq("k"))
      assert(rows(VersionedTable.read(spark, rep)) ==
        rows(VersionedTable.readVersion(spark, src, v)),
        s"replica diverged at v$v")
    }
    // the replica is itself versioned: its v1 (bootstrap) is still intact
    assert(rows(VersionedTable.readVersion(spark, rep, 1)) ==
      rows(VersionedTable.readVersion(spark, src, 1)))
  }

  test("applyChanges handles a changelog that touches every row") {
    val src = fresh("cdc_all_src")
    val rep = fresh("cdc_all_rep")
    VersionedTable.overwrite(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "s", "v"), src)
    VersionedTable.overwrite(Seq((3L, "c", 3L), (4L, "d", 4L)).toDF("k", "s", "v"), src)
    VersionedTable.overwrite(VersionedTable.readVersion(spark, src, 1), rep)
    VersionedTable.applyChanges(
      VersionedTable.changes(spark, src, 1, 2, Seq("k")), rep, Seq("k"))
    assert(rows(VersionedTable.read(spark, rep)) == Set((3L, "c", 3L), (4L, "d", 4L)))
  }

  test("changesWithImages carries the correct before/after row images") {
    val src = fresh("cdc_img_src")
    VersionedTable.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"), src)
    VersionedTable.overwrite( // delete k=1, update k=2, keep k=3, insert k=4
      Seq((2L, "b", 25L), (3L, "c", 30L), (4L, "d", 40L)).toDF("k", "s", "v"), src)
    val ch = VersionedTable.changesWithImages(spark, src, 1, 2, Seq("k"))
      .select($"op", $"k", $"before.s", $"before.v", $"after.s", $"after.v")
      .as[(String, Long, Option[String], Option[Long], Option[String], Option[Long])]
      .collect().toSet
    assert(ch == Set(
      ("D", 1L, Some("a"), Some(10L), None, None),
      ("U", 2L, Some("b"), Some(20L), Some("b"), Some(25L)),
      ("I", 4L, None, None, Some("d"), Some(40L))))
  }

  test("incremental aggregate maintenance equals a full recompute from the final state") {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val d = sf("sf0.001")
    val maintained = SparkEntry.queries("incremental_agg_maintenance")(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    // the query's own staging left v2 at /tmp/graft_tables/incr_agg_src —
    // recompute the aggregate straight from that snapshot
    val recomputed = VersionedTable.readVersion(spark, "/tmp/graft_tables/incr_agg_src", 2)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        graft.core.moneyE(sum(graft.core.dec4($"o_totalprice")), 4).as("sum_price_e4"))
      .as[(Long, Long, Long)].collect().toSet
    assert(maintained == recomputed)
    assert(maintained.nonEmpty)
  }
}
