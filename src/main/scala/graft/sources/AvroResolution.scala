package graft.sources

import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Avro SCHEMA RESOLUTION (reader schema ≠ writer schema) for TypedIngest
  * frames — the Avro spec's "Schema Resolution" rules re-expressed as ONE
  * Spark projection (r14, VERDICT r13 "Next round" #5):
  *
  *  - fields match by NAME (reader order wins; writer order is irrelevant),
  *    or by a reader field's ALIASES (the spec's rename mechanism);
  *  - writer-only fields are ignored (dropped by the projection);
  *  - reader-only fields take the reader's DEFAULT value — a reader field
  *    with no default and no writer match fails loudly at plan time;
  *  - type PROMOTIONS per the spec: int→long/float/double, long→float/double,
  *    float→double, string↔bytes — anything else (narrowing, incompatible)
  *    fails loudly naming the field and both types;
  *  - a writer-NULLABLE field read as reader-NON-NULL resolves (the spec
  *    resolves union-to-branch per datum) but a NULL datum is a runtime
  *    error — reproduced with a codegen'd raise_error guard, never a silent
  *    NULL-through.
  *
  * The reference's single-POJO ReflectData pipeline (StreamingJob.java:53)
  * freezes writer == reader and never hits resolution; a real Snowflake
  * export evolves, and THIS is what consumes yesterday's staged files with
  * today's schema. Plan shape: one projection of codegen'd casts — schema
  * resolution costs zero per-row interpretation, exactly the TypedIngest
  * discipline.
  */
object AvroResolution {

  /** ([null,T] union → (T, nullable); plain schema → (itself, false)). */
  private def unwrap(s: AvroSchema): (AvroSchema, Boolean) =
    if (s.getType != AvroSchema.Type.UNION) (s, false)
    else {
      val nonNull = s.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
      (nonNull.head, true)
    }

  /** Spec promotion table: may a writer value of type `w` be read as `r`? */
  private def promotable(w: AvroSchema.Type, r: AvroSchema.Type): Boolean = {
    import AvroSchema.Type._
    (w, r) match {
      case (INT, LONG) | (INT, FLOAT) | (INT, DOUBLE) => true
      case (LONG, FLOAT) | (LONG, DOUBLE)             => true
      case (FLOAT, DOUBLE)                            => true
      case (STRING, BYTES) | (BYTES, STRING)          => true
      case _                                          => false
    }
  }

  /** The reader default as a literal Column (primitive defaults only —
    * complex defaults would need literal struct/array construction this
    * resolver doesn't model; loud). */
  private def defaultLit(f: AvroSchema.Field,
      target: org.apache.spark.sql.types.DataType): Column = {
    val v = f.defaultVal()
    val base = v match {
      case org.apache.avro.JsonProperties.NULL_VALUE => lit(null)
      case i: java.lang.Integer                      => lit(i.intValue())
      case l: java.lang.Long                         => lit(l.longValue())
      case d: java.lang.Double                       => lit(d.doubleValue())
      case fl: java.lang.Float                       => lit(fl.floatValue())
      case b: java.lang.Boolean                      => lit(b.booleanValue())
      case s: String                                 => lit(s)
      case other => throw new IllegalArgumentException(
        s"avro resolution: unsupported default $other for field ${f.name} " +
          "(primitive defaults only)")
    }
    base.cast(target)
  }

  /** Resolve `df` — typed per the WRITER schema (TypedIngest.fromAvro) —
    * to the READER schema. Output columns in reader-field order under
    * reader names. */
  def resolve(df: DataFrame, writerJson: String, readerJson: String): DataFrame = {
    val writer = new AvroSchema.Parser().parse(writerJson)
    val reader = new AvroSchema.Parser().parse(readerJson)
    require(writer.getType == AvroSchema.Type.RECORD &&
      reader.getType == AvroSchema.Type.RECORD, "record schemas required")
    val writerFields = writer.getFields.asScala.map(f => f.name -> f).toMap
    val cols: Seq[Column] = reader.getFields.asScala.toSeq.map { rf =>
      // name match first, then the reader field's aliases (spec renames)
      val matched = writerFields.get(rf.name).orElse(
        rf.aliases.asScala.collectFirst {
          case a if writerFields.contains(a) => writerFields(a)
        })
      matched match {
        case None =>
          require(rf.hasDefaultValue,
            s"avro resolution: reader field ${rf.name} has no writer match " +
              "and no default — unresolvable per the spec")
          val (rs, _) = unwrap(rf.schema)
          defaultLit(rf, AvroSchemaConverter.toSpark(rs)._1).as(rf.name)
        case Some(wf) =>
          val (ws, wNullable) = unwrap(wf.schema)
          val (rs, rNullable) = unwrap(rf.schema)
          val src = col(wf.name)
          // equal type KINDS are only a pass-through for primitives: two
          // RECORDs/ARRAYs/MAPs/ENUMs/FIXEDs with different inner schemas
          // would silently skip nested renames/promotions/defaults
          // (ADVICE r14) — this resolver models top-level records only, so
          // complex kinds must be structurally IDENTICAL or fail loudly
          val typed: Column =
            if (ws.getType == rs.getType) {
              import AvroSchema.Type._
              ws.getType match {
                case RECORD | ARRAY | MAP | ENUM | FIXED | UNION =>
                  require(ws == rs, s"avro resolution: field ${rf.name} has " +
                    s"matching ${ws.getType} kinds but different schemas — " +
                    "nested resolution is not modeled; make the nested " +
                    s"schemas identical or flatten upstream (writer $ws, reader $rs)")
                  src
                case _ => src
              }
            }
            else if (promotable(ws.getType, rs.getType))
              src.cast(AvroSchemaConverter.toSpark(rs)._1)
            else throw new IllegalArgumentException(
              s"avro resolution: field ${rf.name} cannot promote " +
                s"${ws.getType} -> ${rs.getType} (spec promotions: " +
                "int->long/float/double, long->float/double, float->double, " +
                "string<->bytes)")
          // writer-nullable read as reader-non-null: the union RESOLVES but
          // a null datum is a runtime error per the spec — loud, not a
          // silent null in a required column
          val guarded =
            if (wNullable && !rNullable)
              when(typed.isNull, raise_error(lit(
                s"avro resolution: null in writer field ${wf.name} read as " +
                  s"non-nullable reader field ${rf.name}"))).otherwise(typed)
            else typed
          guarded.as(rf.name)
      }
    }
    df.select(cols: _*)
  }
}
