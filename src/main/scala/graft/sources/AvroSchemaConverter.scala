package graft.sources

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro schema string -> Spark StructType.
  *
  * The reference derives its sink row type from an Avro (AVDL) schema
  * (IcebergTableManager.java:22-25 via AvroSchemaUtil/FlinkSchemaUtil); this
  * is the Spark-native equivalent, covering the type set the reference's
  * converter handles (SnowflakeToRowDataMapFunction.java:64-88:
  * VARCHAR/INTEGER/BIGINT/DOUBLE/FLOAT/BOOLEAN/TIMESTAMP) plus the standard
  * Avro composites.
  */
object AvroSchemaConverter {

  def parse(json: String): StructType =
    toStruct(new AvroSchema.Parser().parse(json))

  def toStruct(schema: AvroSchema): StructType = {
    require(schema.getType == AvroSchema.Type.RECORD, s"expected record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSpark(f.schema)
      StructField(f.name, dt, nullable)
    }.toSeq)
  }

  /** (sparkType, nullable). Unions of [null, T] map to nullable T. */
  def toSpark(s: AvroSchema): (DataType, Boolean) = s.getType match {
    case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => (StringType, false)
    case AvroSchema.Type.INT =>
      s.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _                    => (IntegerType, false)
      }
    case AvroSchema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          (TimestampType, false)
        case _ => (LongType, false)
      }
    case AvroSchema.Type.FLOAT   => (FloatType, false)
    case AvroSchema.Type.DOUBLE  => (DoubleType, false)
    case AvroSchema.Type.BOOLEAN => (BooleanType, false)
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED =>
      // Snowflake NUMBER columns export as bytes/fixed with the `decimal`
      // logical type (the first type any real Snowflake table hits — the
      // reference's 7-type JDBC switch sidesteps it,
      // SnowflakeToRowDataMapFunction.java:66-84); without this branch a
      // decimal-typed export would silently land as raw bytes
      s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          require(d.getPrecision <= DecimalType.MAX_PRECISION,
            s"avro decimal precision ${d.getPrecision} exceeds Spark's " +
              s"max ${DecimalType.MAX_PRECISION}")
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case AvroSchema.Type.RECORD  => (toStruct(s), false)
    case AvroSchema.Type.ARRAY =>
      val (et, en) = toSpark(s.getElementType); (ArrayType(et, en), false)
    case AvroSchema.Type.MAP =>
      val (vt, vn) = toSpark(s.getValueType); (MapType(StringType, vt, vn), false)
    case AvroSchema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
      (toSpark(nonNull.head)._1, true)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }
}
