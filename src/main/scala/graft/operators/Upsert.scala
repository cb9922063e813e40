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
