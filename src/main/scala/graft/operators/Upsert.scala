package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equality-field upsert and CDC compaction — the Iceberg-v2 upsert semantic
  * the reference configures via FlinkSink
  * (IcebergSinkBuilder.java:40-44: `.equalityFieldColumns(keys).upsert(true)`),
  * re-expressed as relational algebra Spark can optimize.
  */
object Upsert {

  /** Replace base rows whose equality fields match an update row, then append
    * all updates: `base ANTI JOIN keys(updates) UNION ALL updates`.
    * The anti join broadcasts when the update batch is small (the common CDC
    * case) — Catalyst/AQE decides; at 100 TB the base table never rewrites
    * more than the matching partitions when combined with
    * GraftTableWriter.upsertPartitioned.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val keyDf = updates.select(keys.map(col): _*).distinct()
    base.join(keyDf, keys, "left_anti").unionByName(updates)
  }

  /** Full `MERGE INTO` (the Iceberg/Delta statement semantics), one keyed
    * full-outer join:
    *
    *   WHEN MATCHED AND deleteWhen(target, source)  THEN DELETE
    *   WHEN MATCHED                                 THEN UPDATE SET *
    *   WHEN NOT MATCHED AND insertWhen(source)      THEN INSERT *
    *
    * Unlike [[graft.sinks.VersionedTable.applyChanges]] (which replays a
    * PRE-TAGGED U/D changelog), MERGE derives each row's action from the
    * join outcome plus the caller's conditions — the statement users write.
    *
    * Semantics locked by spec:
    *  - source payload wins on match FIELD-FOR-FIELD, so a legitimately-NULL
    *    source field overwrites (struct-level pick, never per-field
    *    coalesce — the AsOfJoin NULL-payload lesson);
    *  - the MERGE cardinality rule: two source rows matching one target key
    *    is nondeterministic, Iceberg/Delta raise — so does this, via an
    *    in-plan per-key count + raise_error (no driver-side validation
    *    pass);
    *  - unmatched-by-source target rows pass through untouched.
    *
    * Scale: one shuffle of each side by the merge keys (AQE broadcasts the
    * batch side when small — the common CDC case); the cardinality guard
    * rides the source's own keyed partitioning. Combine with
    * GraftTableWriter.upsertPartitioned to confine the physical rewrite to
    * touched partitions.
    */
  def merge(base: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: (Column, Column) => Column,
      insertWhen: Column => Column = _ => lit(true)): DataFrame = {
    val payload = base.columns.filterNot(keys.contains).toSeq
    require(source.columns.filterNot(keys.contains).toSeq.sorted == payload.sorted,
      s"merge: source payload ${source.columns.toSeq} must match target $payload + $keys")
    val srcW = Window.partitionBy(keys.map(col): _*)
    val s = source
      .withColumn("__src_rows_for_key", count(lit(1)).over(srcW))
      .select(keys.map(col)
        :+ struct(payload.map(col): _*).as("__s")
        :+ when(col("__src_rows_for_key") > 1, raise_error(concat(
            lit("MERGE cardinality violation: multiple source rows for key ("),
            concat_ws(",", keys.map(k => col(k).cast("string")): _*), lit(")"))))
          .otherwise(lit(1)).as("__card"): _*)
    val b = base.select(keys.map(col) :+ struct(payload.map(col): _*).as("__b"): _*)
    val matched = col("__b").isNotNull && col("__s").isNotNull
    val pick = when(col("__s").isNotNull, col("__s")).otherwise(col("__b"))
    b.join(s, keys, "full_outer")
      // __card must stay referenced so the guard evaluates on every source row
      .filter(col("__s").isNull || col("__card") === 1)
      // a NULL-evaluating condition is NOT satisfied (SQL three-valued
      // logic): it must keep the row, not let the filter drop it
      .filter(!(matched && coalesce(deleteWhen(col("__b"), col("__s")), lit(false))))
      .filter(col("__b").isNotNull || coalesce(insertWhen(col("__s")), lit(false)))
      .select(keys.map(col) ++ payload.map(p => pick.getField(p).as(p)): _*)
  }

  /** CDC compaction: keep the latest version per key, ordered by `ordering`
    * (descending priority first element). One shuffle by key.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
