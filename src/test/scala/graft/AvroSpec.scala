package graft

import graft.sources.{AvroSchemaConverter, TypedIngest}
import org.apache.spark.sql.types._

/** AvroSchemaConverter: the `decimal` logical type (the Snowflake NUMBER
  * export shape — bytes/fixed + precision/scale) maps to DecimalType and
  * round-trips values through TypedIngest; bytes WITHOUT the logical type
  * still map to binary; out-of-range precision fails loudly.
  */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("decimal logical type on bytes and fixed maps to DecimalType(p,s)") {
    val st = AvroSchemaConverter.parse(
      """{"type":"record","name":"R","fields":[
        {"name":"a","type":{"type":"bytes","logicalType":"decimal","precision":18,"scale":2}},
        {"name":"b","type":{"type":"fixed","name":"F","size":16,"logicalType":"decimal","precision":38,"scale":10}},
        {"name":"c","type":["null",{"type":"bytes","logicalType":"decimal","precision":9,"scale":0}]},
        {"name":"d","type":"bytes"}]}""")
    assert(st("a").dataType == DecimalType(18, 2) && !st("a").nullable)
    assert(st("b").dataType == DecimalType(38, 10))
    assert(st("c").dataType == DecimalType(9, 0) && st("c").nullable)
    assert(st("d").dataType == BinaryType, "bytes without the logical type stay binary")
  }

  test("precision past Spark's 38 fails loudly instead of truncating") {
    val e = intercept[IllegalArgumentException] {
      AvroSchemaConverter.parse(
        """{"type":"record","name":"R","fields":[
          {"name":"a","type":{"type":"bytes","logicalType":"decimal","precision":40,"scale":2}}]}""")
    }
    assert(e.getMessage.contains("precision 40"))
  }

  test("decimal values round-trip exactly through the TypedIngest cast") {
    val schema = """{"type":"record","name":"R","fields":[
      {"name":"id","type":"long"},
      {"name":"amt","type":{"type":"bytes","logicalType":"decimal","precision":18,"scale":2}}]}"""
    val staged = Seq((1L, "0.01"), (2L, "-12345678901234.56"), (3L, "490.02"),
      (4L, "0.00")).toDF("id", "amt")
    val typed = TypedIngest.fromAvro(staged, schema)
    assert(typed.schema("amt").dataType == DecimalType(18, 2))
    val got = typed.orderBy($"id").select($"amt".cast("string"))
      .as[String].collect().toSeq
    assert(got == Seq("0.01", "-12345678901234.56", "490.02", "0.00"), got.toString)
  }

  // ---- schema RESOLUTION matrix (r14): reader schema != writer schema ----

  private def rec(fields: String): String =
    s"""{"type":"record","name":"R","fields":[$fields]}"""

  test("resolution: reorder + promote + default + writer-only drop, in one projection") {
    val writer = rec("""{"name":"k","type":"long"},{"name":"n","type":"string"},
      {"name":"sz","type":"int"},{"name":"cents","type":"int"},
      {"name":"legacy","type":"string"}""")
    val reader = rec("""{"name":"n","type":"string"},{"name":"k","type":"long"},
      {"name":"cents","type":"long"},{"name":"sz","type":"double"},
      {"name":"ch","type":"string","default":"web"},
      {"name":"opt","type":["null","long"],"default":null}""")
    val df = Seq((1L, "a", 3, 100, "x"), (2L, "b", 4, 200, "y"))
      .toDF("k", "n", "sz", "cents", "legacy")
    val got = graft.sources.AvroResolution.resolve(df, writer, reader)
    assert(got.columns.toSeq == Seq("n", "k", "cents", "sz", "ch", "opt"))
    assert(got.schema("cents").dataType == LongType)
    assert(got.schema("sz").dataType == DoubleType)
    val rows = got.orderBy($"k")
      .as[(String, Long, Long, Double, String, Option[Long])].collect().toSeq
    assert(rows == Seq(("a", 1L, 100L, 3.0, "web", None),
      ("b", 2L, 200L, 4.0, "web", None)))
  }

  test("resolution: reader field ALIAS matches a renamed writer field") {
    val writer = rec("""{"name":"old_name","type":"string"},{"name":"k","type":"long"}""")
    val reader = rec("""{"name":"k","type":"long"},
      {"name":"new_name","type":"string","aliases":["old_name"]}""")
    val got = graft.sources.AvroResolution.resolve(
      Seq(("v", 7L)).toDF("old_name", "k"), writer, reader)
    assert(got.columns.toSeq == Seq("k", "new_name"))
    assert(got.as[(Long, String)].head() == ((7L, "v")))
  }

  test("resolution: string<->bytes promotions round-trip") {
    val writer = rec("""{"name":"s","type":"string"},{"name":"b","type":"bytes"}""")
    val reader = rec("""{"name":"s","type":"bytes"},{"name":"b","type":"string"}""")
    val df = Seq(("hi", "yo".getBytes("UTF-8"))).toDF("s", "b")
    val got = graft.sources.AvroResolution.resolve(df, writer, reader)
    assert(got.schema("s").dataType == BinaryType && got.schema("b").dataType == StringType)
    val r = got.head()
    assert(new String(r.getAs[Array[Byte]]("s"), "UTF-8") == "hi")
    assert(r.getAs[String]("b") == "yo")
  }

  test("resolution: non-promotable change and default-less new field fail loudly") {
    val writer = rec("""{"name":"d","type":"double"},{"name":"k","type":"long"}""")
    val df = Seq((1.5, 1L)).toDF("d", "k")
    val narrow = intercept[IllegalArgumentException] {
      graft.sources.AvroResolution.resolve(df, writer,
        rec("""{"name":"d","type":"int"},{"name":"k","type":"long"}"""))
    }
    assert(narrow.getMessage.contains("cannot promote"))
    val noDefault = intercept[IllegalArgumentException] {
      graft.sources.AvroResolution.resolve(df, writer,
        rec("""{"name":"d","type":"double"},{"name":"k","type":"long"},
          {"name":"extra","type":"string"}"""))
    }
    assert(noDefault.getMessage.contains("no default"))
  }

  test("resolution: matching complex KINDS with different inner schemas fail loudly (r15)") {
    // two RECORD kinds used to pass the writer column through unresolved,
    // silently ignoring nested renames/promotions (ADVICE r14) — identical
    // nested schemas still resolve, differing ones must raise
    val nested = """{"type":"record","name":"pt","fields":[
      {"name":"x","type":"long"},{"name":"y","type":"long"}]}"""
    val writer = rec(s"""{"name":"k","type":"long"},{"name":"p","type":$nested}""")
    val df = Seq((1L, 2L, 3L)).toDF("k", "x", "y")
      .select($"k", org.apache.spark.sql.functions.struct($"x", $"y").as("p"))
    val same = graft.sources.AvroResolution.resolve(df, writer, writer)
    assert(same.select($"k", $"p.x", $"p.y").as[(Long, Long, Long)]
      .collect().toSeq == Seq((1L, 2L, 3L)))
    val differing = intercept[IllegalArgumentException] {
      graft.sources.AvroResolution.resolve(df, writer,
        rec("""{"name":"k","type":"long"},{"name":"p","type":
          {"type":"record","name":"pt","fields":[
            {"name":"x","type":"long"},{"name":"z","type":"long","default":0}]}}"""))
    }
    assert(differing.getMessage.contains("nested resolution is not modeled"))
  }

  test("resolution: writer-nullable to reader-non-null raises on an actual null, not silently") {
    val writer = rec("""{"name":"k","type":"long"},
      {"name":"v","type":["null","string"],"default":null}""")
    val reader = rec("""{"name":"k","type":"long"},{"name":"v","type":"string"}""")
    val ok = graft.sources.AvroResolution.resolve(
      Seq((1L, Some("x")), (2L, Some("y"))).toDF("k", "v"), writer, reader)
    assert(ok.orderBy($"k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y"))) // null-free data resolves fine
    val bad = graft.sources.AvroResolution.resolve(
      Seq((1L, Some("x")), (2L, None)).toDF("k", "v"), writer, reader)
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null && e.getMessage.contains("non-nullable reader field"),
      s"expected the raise_error guard, got: ${e.getMessage}")
  }
}
