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
}
