package graft

import graft.sources.VariantShred
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** [[VariantShred]]: pinned-schema shredding of a Snowflake-VARIANT-style
  * JSON text column — typed round-trip, sparse documents stay NULL (not
  * drift), unknown keys and malformed documents raise loudly, inference is
  * bounded-sample.
  */
class VariantShredSpec extends SparkSpec {
  import spark.implicits._

  private val pinned = StructType.fromDDL(
    "a BIGINT, b STRING, nested STRUCT<x: BIGINT, y: STRING>")

  test("typed round-trip through the pinned schema, one projection") {
    val df = Seq(
      (1L, """{"a": 10, "b": "hi", "nested": {"x": 7, "y": "z"}}"""),
      (2L, """{"a": 20, "b": "yo", "nested": {"x": 8, "y": "w"}}"""))
      .toDF("id", "variant")
    val out = VariantShred.shred(df, "variant", pinned)
    assert(out.columns.toSeq == Seq("id", "a", "b", "nested"))
    val rows = out.orderBy($"id")
      .select($"id", $"a", $"b", $"nested.x", $"nested.y")
      .as[(Long, Long, String, Long, String)].collect().toSeq
    assert(rows == Seq((1L, 10L, "hi", 7L, "z"), (2L, 20L, "yo", 8L, "w")))
  }

  test("sparse documents: a KNOWN key absent from a doc is NULL, not drift") {
    val df = Seq((1L, """{"a": 1}"""), (2L, null.asInstanceOf[String]))
      .toDF("id", "variant")
    val out = VariantShred.shred(df, "variant", pinned).orderBy($"id")
      .select($"id", $"a", $"b").as[(Long, Option[Long], Option[String])]
      .collect().toSeq
    assert(out == Seq((1L, Some(1L), None), (2L, None, None)))
  }

  test("unknown top-level key raises, naming the key") {
    val df = Seq((1L, """{"a": 1, "surprise": true}""")).toDF("id", "variant")
    val e = intercept[Exception](
      VariantShred.shred(df, "variant", pinned).collect())
    assert(e.getMessage.contains("unknown top-level key") &&
      e.getMessage.contains("surprise"), e.getMessage)
  }

  test("malformed document raises, never silent NULL-through") {
    val df = Seq((1L, """{"a": not-json""")).toDF("id", "variant")
    val e = intercept[Exception](
      VariantShred.shred(df, "variant", pinned).collect())
    assert(e.getMessage.contains("malformed"), e.getMessage)
  }

  test("inference is bounded-sample and matches the hand-pinned schema") {
    val df = (1L to 5000L).map(i =>
      (i, s"""{"a": $i, "b": "s$i", "nested": {"x": ${i * 2}, "y": "t"}}"""))
      .toDF("id", "variant")
    val inferred = VariantShred.inferSchema(df, "variant", sampleN = 100)
    assert(inferred == pinned, inferred.toDDL)
  }

  test("flatten: array fans out with 0-based index; outer keeps empty rows") {
    import org.apache.spark.sql.types.StructType
    val el = StructType.fromDDL("k BIGINT, s STRING")
    val df = Seq(
      (1L, """[{"k": 10, "s": "a"}, {"k": 20, "s": "b"}]"""),
      (2L, """[]"""),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "variant")
    val inner = VariantShred.flatten(df, "variant", el)
      .select($"id", $"index", $"value.k", $"value.s")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(inner == Set((1L, 0L, 10L, "a"), (1L, 1L, 20L, "b")))
    val outer = VariantShred.flatten(df, "variant", el, outer = true)
      .select($"id", $"index").as[(Long, Option[Long])].collect().toSet
    assert(outer == Set((1L, Some(0L)), (1L, Some(1L)), (2L, None), (3L, None)))
  }

  test("flatten: a non-array document raises") {
    import org.apache.spark.sql.types.StructType
    val df = Seq((1L, """{"k": 1}""")).toDF("id", "variant")
    val e = intercept[Exception](VariantShred.flatten(
      df, "variant", StructType.fromDDL("k BIGINT")).collect())
    assert(e.getMessage.contains("non-array"), e.getMessage)
  }

  test("column-name collision with an existing column refuses") {
    val df = Seq((1L, """{"a": 1}""")).toDF("a", "variant")
    val e = intercept[IllegalArgumentException](
      VariantShred.shred(df, "variant", pinned))
    assert(e.getMessage.contains("collides"))
  }
}
