package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema-driven typing of an untyped (all-string) staged source.
  *
  * The reference stages Snowflake rows through an all-string Avro record
  * (SnowFlakeTable.avdl) and converts per-field with per-row Java reflection
  * (SnowflakeToRowDataMapFunction.java:64-88). Spark-first: one projection of
  * codegen'd `cast`s — schema applied once at plan time, zero per-row
  * reflection, and Catalyst prunes any column the downstream query drops.
  */
object TypedIngest {

  /** Cast `df`'s columns to the target schema (by name; order from schema). */
  def apply(df: DataFrame, target: StructType): DataFrame =
    df.select(target.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  /** Convenience: target described as an Avro schema JSON string. */
  def fromAvro(df: DataFrame, avroJson: String): DataFrame =
    apply(df, AvroSchemaConverter.parse(avroJson))
}
