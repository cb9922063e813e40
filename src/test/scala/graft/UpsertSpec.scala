package graft

import graft.sinks.GraftTableWriter
import org.apache.spark.sql.functions._

/** The version-aware upsert must converge to the same table whatever order
  * the update batches arrive in — the property the streaming CDC pipeline
  * relies on (micro-batch order is not contractual). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsertVersioned is arrival-order independent") {
    val batches = Seq(
      Seq((1L, "a", 10L, 1.0), (2L, "a", 11L, 2.0)),
      Seq((1L, "a", 30L, 3.0), (3L, "b", 12L, 4.0)),
      Seq((1L, "a", 20L, 5.0), (2L, "a", 25L, 6.0)))
      .map(_.toDF("user_id", "event_type", "event_id", "value"))
    val keys = Seq("user_id", "event_type")
    def runOrder(order: Seq[Int], path: String): Set[(Long, String, Long, Double)] = {
      GraftTableWriter.drop(spark, path)
      order.foreach(i => GraftTableWriter.upsertVersioned(
        batches(i), path, keys, Seq(col("event_id").desc)))
      spark.read.parquet(path).as[(Long, String, Long, Double)].collect().toSet
    }
    val fwd = runOrder(Seq(0, 1, 2), "/tmp/graft_tables/spec_uv_fwd")
    val rev = runOrder(Seq(2, 1, 0), "/tmp/graft_tables/spec_uv_rev")
    val expected = Set(
      (1L, "a", 30L, 3.0), // max event_id wins regardless of batch order
      (2L, "a", 25L, 6.0),
      (3L, "b", 12L, 4.0))
    assert(fwd == expected && rev == expected)
  }

  /** Every parquet file under `dir`, as (relative path, full byte content). */
  private def fileBytes(dir: String): Map[String, Seq[Byte]] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map[String, Seq[Byte]]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        out(root.relativize(p).toString) = java.nio.file.Files.readAllBytes(p).toSeq
    }
    out.toMap
  }

  test("upsertPartitioned rewrites only touched partitions, byte-identically elsewhere") {
    val path = "/tmp/graft_tables/spec_upsert_part"
    GraftTableWriter.drop(spark, path)
    val base = (1L to 400L).map(k => (k, s"name_$k", (k % 4).toString, k * 1.5))
      .toDF("id", "name", "p", "score")
    GraftTableWriter.overwrite(base, path, partitions = Seq("p"))
    val before = fileBytes(path)
    assert(before.keySet.map(_.split('/').head) == Set("p=0", "p=1", "p=2", "p=3"))

    // update batch confined to partition p=1
    val upd = Seq((1L, "updated_1", "1", -1.0), (401L, "new_401", "1", -2.0))
      .toDF("id", "name", "p", "score")
    GraftTableWriter.upsertPartitioned(upd, path, Seq("id"), Seq("p"))

    val after = fileBytes(path)
    def part(m: Map[String, Seq[Byte]], p: String) = m.filter(_._1.startsWith(p + "/"))
    for (p <- Seq("p=0", "p=2", "p=3"))
      assert(part(after, p) == part(before, p), s"untouched partition $p changed")
    assert(part(after, "p=1") != part(before, "p=1"))
    assert(!after.keySet.exists(_.contains("__old")) &&
      !new java.io.File(path + "__staging").exists, "swap left temp dirs behind")

    // merged semantics: key 1 replaced, 401 appended, everything else intact
    val got = spark.read.parquet(path)
      .select($"id", $"name", $"p", $"score").as[(Long, String, String, Double)]
      .collect().toSet
    val expected = (2L to 400L).map(k => (k, s"name_$k", (k % 4).toString, k * 1.5)).toSet ++
      Set((1L, "updated_1", "1", -1.0), (401L, "new_401", "1", -2.0))
    assert(got == expected)
  }

  test("upsertPartitioned handles multi-level partitions and new partition values") {
    val path = "/tmp/graft_tables/spec_upsert_part2"
    GraftTableWriter.drop(spark, path)
    val base = Seq((1L, "a", 10, 1.0), (2L, "a", 20, 2.0), (3L, "b", 10, 3.0))
      .toDF("id", "grp", "bucket", "v")
    GraftTableWriter.overwrite(base, path, partitions = Seq("grp", "bucket"))
    val before = fileBytes(path)
    val upd = Seq((3L, "b", 10, 30.0), (4L, "c", 99, 4.0)) // touch b/10, create c/99
      .toDF("id", "grp", "bucket", "v")
    GraftTableWriter.upsertPartitioned(upd, path, Seq("id"), Seq("grp", "bucket"))
    val after = fileBytes(path)
    def part(m: Map[String, Seq[Byte]], p: String) = m.filter(_._1.startsWith(p + "/"))
    for (p <- Seq("grp=a/bucket=10", "grp=a/bucket=20"))
      assert(part(after, p) == part(before, p), s"untouched partition $p changed")
    val got = spark.read.parquet(path)
      .select($"id", $"grp", $"bucket", $"v").as[(Long, String, Int, Double)]
      .collect().toSet
    assert(got == Set((1L, "a", 10, 1.0), (2L, "a", 20, 2.0),
      (3L, "b", 10, 30.0), (4L, "c", 99, 4.0)))
  }

  // ---- Upsert.merge (full MERGE INTO semantics) --------------------------

  private def mergeRows(out: org.apache.spark.sql.DataFrame) =
    out.select($"k", $"v", $"tag").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
      .toSet

  test("merge: matched update, matched-and-cond delete, not-matched-and-cond insert") {
    val base = Seq((1L, 10L, "b"), (2L, 20L, "b"), (3L, 30L, "b"))
      .toDF("k", "v", "tag")
    val src = Seq(
      (2L, 99L, "s"),           // matched -> update
      (3L, 0L, "s"),            // matched + tombstone -> delete
      (4L, 40L, "s"),           // not matched -> insert
      (5L, 0L, "s"))            // not matched tombstone -> refused by insertWhen
      .toDF("k", "v", "tag")
    val out = graft.operators.Upsert.merge(base, src, Seq("k"),
      deleteWhen = (_, s) => s.getField("v") === 0L,
      insertWhen = s => s.getField("v") =!= 0L)
    assert(mergeRows(out) == Set(
      (1L, Some(10L), "b"),     // untouched target passes through
      (2L, Some(99L), "s"),
      (4L, Some(40L), "s")))
  }

  test("merge: a legitimately-NULL source field overwrites on match (no per-field coalesce)") {
    val base = Seq((1L, Some(10L), "b")).toDF("k", "v", "tag")
    val src = Seq((1L, None: Option[Long], "s")).toDF("k", "v", "tag")
    val out = graft.operators.Upsert.merge(base, src, Seq("k"),
      deleteWhen = (_, _) => lit(false))
    assert(mergeRows(out) == Set((1L, None, "s")),
      "NULL source payload must win on match, not fall back to the target value")
  }

  test("merge: NULL-evaluating delete condition is NOT satisfied (row kept, updated)") {
    val base = Seq((1L, Some(10L), "b")).toDF("k", "v", "tag")
    val src = Seq((1L, None: Option[Long], "s")).toDF("k", "v", "tag")
    // s.v === 0 evaluates NULL for the null payload: three-valued logic says
    // the clause does not fire -> the row must survive as an update
    val out = graft.operators.Upsert.merge(base, src, Seq("k"),
      deleteWhen = (_, s) => s.getField("v") === 0L)
    assert(mergeRows(out) == Set((1L, None, "s")))
  }

  test("merge: duplicate source keys raise (the MERGE cardinality rule)") {
    val base = Seq((1L, 10L, "b")).toDF("k", "v", "tag")
    val src = Seq((1L, 11L, "s"), (1L, 12L, "s")).toDF("k", "v", "tag")
    val e = intercept[Exception] {
      graft.operators.Upsert.merge(base, src, Seq("k"),
        deleteWhen = (_, _) => lit(false)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("MERGE cardinality violation")),
      s"expected the cardinality guard, got: $e")
  }
}
