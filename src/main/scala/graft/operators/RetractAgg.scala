package graft.operators

import graft.sinks.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flink retract-stream aggregation re-expressed for micro-batches: a
  * per-user aggregate over LATEST-per-key state stays correct while a keyed
  * CDC stream keeps updating keys. Each batch:
  *
  *   1. compacts per key (event_id logical clock),
  *   2. joins the O(batch) affected keys against the replica for old images,
  *   3. decides winners by event_id — so ANY batch order and stale replays
  *      converge (no coupling to delivery order),
  *   4. folds signed deltas (+winner −old) into the aggregate table,
  *   5. upserts winners into the replica.
  *
  * Everything is O(batch); the base table is never re-aggregated. The
  * aggregate commits BEFORE the replica, both batch-id-stamped: a crash
  * between the two commits replays the same deltas from the unchanged
  * replica, the aggregate's batch-id skip suppresses the double-apply, and
  * the pair converges — the two-table exactly-once ordering (spec-injected
  * via `crashBetweenCommits`). The reverse order would lose the delta
  * forever: a replayed batch would see the already-updated replica and
  * compute zero deltas.
  *
  * Mirrors the reference's keyed-state + retraction semantics
  * (SnowflakeProcessFunction.java:88-122 keyed ValueState; Flink -U/+U
  * changelog rows) without a per-key process function.
  */
object RetractAgg {

  /** Apply one micro-batch of keyed updates `(keys..., event_id, v_c)` to
    * the `repPath` replica and the `aggPath` per-user aggregate
    * `(user_id, sum_v_c, n_types)`. Idempotent per `batchId`. */
  def applyBatch(spark: SparkSession, batch: DataFrame, repPath: String,
      aggPath: String, keys: Seq[String], batchId: Long,
      crashBetweenCommits: () => Unit = () => ()): Unit = {
    val b = Upsert.latestByKey(batch, keys, Seq(col("event_id").desc))
    val rep = VersionedTable.read(spark, repPath)
    val old = rep.join(b.select(keys.map(col): _*).distinct(), keys)
    val winner = Upsert.latestByKey(
      old.withColumn("side", lit(0)).unionByName(b.withColumn("side", lit(1))),
      keys, Seq(col("event_id").desc, col("side").desc))
    val perKey = winner.as("w").join(old.as("o"), keys, "left_outer")
      .select(col("user_id"),
        (col("w.v_c") - coalesce(col("o.v_c"), lit(0L))).as("dv"),
        when(col("o.v_c").isNull, 1L).otherwise(0L).as("dn"))
    val delta = perKey.groupBy("user_id")
      .agg(sum(col("dv")).as("dv"), sum(col("dn")).as("dn"))
    val newAgg = delta.as("d")
      .join(VersionedTable.read(spark, aggPath).as("a"), Seq("user_id"), "left_outer")
      .select(col("user_id"),
        (coalesce(col("a.sum_v_c"), lit(0L)) + col("d.dv")).as("sum_v_c"),
        (coalesce(col("a.n_types"), lit(0L)) + col("d.dn")).as("n_types"))
    VersionedTable.upsertOnce(newAgg, aggPath, Seq("user_id"), batchId)
    crashBetweenCommits()
    VersionedTable.upsertOnce(winner.drop("side"), repPath, keys, batchId)
    ()
  }
}
