package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Snowflake VARIANT SHREDDING (r14, VERDICT r13 "Next round" #6): the
  * first operator a Snowflake user with semi-structured columns reaches
  * for. `SnowflakeTypes` lands VARIANT/OBJECT/ARRAY as JSON text (the
  * export surface); this turns that text column into TYPED columns:
  *
  *  - [[inferSchema]] bootstraps a schema from a BOUNDED sample (Spark's
  *    JSON inference over `limit(sampleN)` — one small job, never a full
  *    corpus scan). The result is meant to be PINNED as a literal in the
  *    job (the schema_of_json discipline): inference runs once at
  *    development time, production carries the literal.
  *  - [[shred]] applies the PINNED schema as one codegen'd `from_json`
  *    projection with LOUD drift detection: a document with a top-level
  *    key the pinned schema doesn't know raises (naming the key), and a
  *    malformed document raises — silent NULL-through on drift is how
  *    semi-structured pipelines rot. A known key ABSENT from a document
  *    stays a NULL column (the normal sparse-VARIANT shape, not drift).
  *
  * Scale: both guards and the shred are per-row codegen'd expressions in
  * ONE projection — no second scan, no driver-side JSON. */
object VariantShred {

  /** Bootstrap a schema from a bounded sample of the JSON column. */
  def inferSchema(df: DataFrame, column: String, sampleN: Int = 1000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    spark.read.json(df.select(col(column).cast("string")).limit(sampleN).as[String]).schema
  }

  /** Snowflake LATERAL FLATTEN over a VARIANT ARRAY (the companion every
    * VARIANT user reaches for next): `column` holds a JSON ARRAY of
    * elements typed by the pinned `element` schema; each row fans out to
    * one row per array element carrying `index` (0-based, FLATTEN's INDEX
    * column) and the element's fields shredded inline. `outer = true`
    * keeps rows whose array is empty/NULL with a NULL index (Snowflake's
    * OUTER => TRUE); the default drops them, like FLATTEN. Malformed
    * documents raise (a JSON OBJECT where an array is expected is
    * malformed here). One codegen'd generate — no driver-side JSON. */
  def flatten(df: DataFrame, column: String,
      element: org.apache.spark.sql.types.DataType,
      outer: Boolean = false): DataFrame = {
    val src = col(column)
    val arr = from_json(src, org.apache.spark.sql.types.ArrayType(element))
    // the OBJECT probe is explicit: Spark's from_json permissively WRAPS a
    // lone object into a one-element array for array schemas, which would
    // silently flatten a non-array document instead of refusing it
    val guarded = when(src.isNull, arr)
      .when(json_object_keys(src).isNotNull, raise_error(concat(
        lit(s"variant flatten: non-array (object) document in $column: "), src)))
      .when(arr.isNull, raise_error(concat(
        lit(s"variant flatten: malformed or non-array document in $column: "), src)))
      .otherwise(arr)
    val passthrough = df.columns.toSeq.filter(_ != column).map(col)
    val exploded =
      if (outer) posexplode_outer(guarded) else posexplode(guarded)
    df.select(passthrough :+ exploded.as(Seq("index", "value")): _*)
      .withColumn("index", col("index").cast("long"))
  }

  /** Shred `column` (JSON text) into one typed column per top-level field
    * of the PINNED `schema`, loudly rejecting unknown-key drift and
    * malformed documents. Other columns pass through; the variant column
    * itself is dropped unless `keepColumn`. */
  def shred(df: DataFrame, column: String, schema: StructType,
      keepColumn: Boolean = false): DataFrame = {
    df.columns.filter(_ != column).foreach { c =>
      require(!schema.fieldNames.contains(c),
        s"variant shred: top-level field $c collides with an existing column")
    }
    val src = col(column)
    val knownKeys = array(schema.fieldNames.toSeq.map(lit): _*)
    // json_object_keys is NULL on malformed/non-object input, so the drift
    // probe doubles as the malformed probe: null text passes (null row),
    // null keys on non-null text = malformed, an unknown key = drift
    val keys = json_object_keys(src)
    val unknown = filter(keys, k => !array_contains(knownKeys, k))
    val guarded = when(src.isNull, src)
      .when(keys.isNull, raise_error(concat(
        lit(s"variant shred: malformed document in $column: "), src)))
      .when(size(unknown) > 0, raise_error(concat(
        lit(s"variant shred: unknown top-level key(s) in $column: "),
        concat_ws(",", unknown), lit(" — re-pin the schema"))))
      .otherwise(src)
    val parsed = from_json(guarded, schema)
    val passthrough: Seq[Column] = df.columns.toSeq
      .filter(c => keepColumn || c != column).map(col)
    val shredded: Seq[Column] =
      schema.fieldNames.toSeq.map(f => parsed.getField(f).as(f))
    df.select(passthrough ++ shredded: _*)
  }
}
