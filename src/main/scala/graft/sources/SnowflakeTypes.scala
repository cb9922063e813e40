package graft.sources

import org.apache.avro.{LogicalTypes, SchemaBuilder}
import org.apache.spark.sql.types._

/** Snowflake catalog type text → Spark type — the mapping layer the
  * reference handles with a 7-case JDBC switch
  * (SnowflakeToRowDataMapFunction.java:64-84: VARCHAR/INTEGER/BIGINT/
  * DOUBLE/FLOAT/BOOLEAN/TIMESTAMP) and which any real Snowflake table
  * exceeds on its first NUMBER or TIMESTAMP_NTZ column. Pairs with
  * [[ShardedIngest.PagingDialect.Snowflake]] (paging + identifier
  * quoting); the input is the type text Snowflake's
  * `INFORMATION_SCHEMA.COLUMNS` / `DESC TABLE` reports.
  *
  * Fixed-point NUMBER(p,s) routes through the SAME Avro-decimal path the
  * Avro sources use ([[AvroSchemaConverter.toSpark]] on a
  * `bytes + decimal(p,s)` schema), so the precision guard and
  * DecimalType construction live in exactly one place. Unknown types fail
  * LOUDLY — a silently-stringified GEOGRAPHY column is a correctness bug
  * downstream, not a convenience.
  */
object SnowflakeTypes {

  private val Parens = raw"\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)\s*".r

  /** @param typeText e.g. "NUMBER(38,0)", "VARCHAR(16777216)",
    *                 "TIMESTAMP_NTZ(9)", "FLOAT", "BOOLEAN". Case-insensitive;
    *                 parameters optional where Snowflake defaults them. */
  def toSparkType(typeText: String): DataType = {
    val t = typeText.trim.toUpperCase(java.util.Locale.ROOT)
    val (base, p, s) = t.indexOf('(') match {
      case -1 => (t, None, None)
      case i =>
        t.substring(i) match {
          case Parens(prec, scale) =>
            (t.substring(0, i).trim, Some(prec.toInt), Option(scale).map(_.toInt))
          case other =>
            throw new IllegalArgumentException(
              s"unparseable Snowflake type parameters '$other' in '$typeText'")
        }
    }
    base match {
      // All Snowflake integer synonyms (INT/INTEGER/BIGINT/SMALLINT/
      // TINYINT/BYTEINT) are stored as NUMBER(38,0); DESC TABLE reports
      // them that way, so they all land here
      case "NUMBER" | "DECIMAL" | "NUMERIC" | "INT" | "INTEGER" | "BIGINT"
          | "SMALLINT" | "TINYINT" | "BYTEINT" =>
        avroDecimal(p.getOrElse(38), s.getOrElse(0))
      // every Snowflake float synonym is one 64-bit type
      case "FLOAT" | "FLOAT4" | "FLOAT8" | "DOUBLE" | "DOUBLE PRECISION" | "REAL" =>
        DoubleType
      case "VARCHAR" | "STRING" | "TEXT" | "CHAR" | "CHARACTER" => StringType
      case "BOOLEAN"             => BooleanType
      case "DATE"                => DateType
      // wall-clock with no zone: Spark's TIMESTAMP_NTZ, NOT TimestampType
      // (which is an instant and would shift values by the session zone)
      case "TIMESTAMP_NTZ" | "DATETIME" => TimestampNTZType
      // instants (LTZ renders in session zone, TZ carries an offset —
      // both identify a point in time)
      case "TIMESTAMP_LTZ" | "TIMESTAMP_TZ" | "TIMESTAMP" => TimestampType
      case "TIME"                => TimestampNTZType
      case "BINARY" | "VARBINARY" => BinaryType
      // semi-structured: Snowflake JDBC surfaces these as JSON text
      case "VARIANT" | "OBJECT" | "ARRAY" => StringType
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Snowflake type '$other' (from '$typeText'); " +
            "add an explicit mapping rather than defaulting")
    }
  }

  /** NUMBER(p,s) via the Avro-decimal path: build a `bytes` schema carrying
    * the decimal logical type and let [[AvroSchemaConverter]] produce the
    * DecimalType (one shared precision guard). */
  private def avroDecimal(precision: Int, scale: Int): DataType = {
    val bytes = SchemaBuilder.builder().bytesType()
    LogicalTypes.decimal(precision, scale).addToSchema(bytes)
    AvroSchemaConverter.toSpark(bytes)._1
  }

  /** (name, typeText) column list → Spark schema, identifiers passed
    * through verbatim (quote-on-reference is the dialect's job). All
    * Snowflake columns are nullable unless declared NOT NULL — callers who
    * know better can tighten. */
  def toStructType(columns: Seq[(String, String)]): StructType =
    StructType(columns.map { case (name, tt) =>
      StructField(name, toSparkType(tt), nullable = true)
    })
}
