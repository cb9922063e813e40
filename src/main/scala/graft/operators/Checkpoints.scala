package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation strategy for the iterative operators (PageRank, Bfs,
  * KMeans.lloyd, NearDup.connectedComponents).
  *
  * The default, `localCheckpoint`, materializes the iterate to EXECUTOR-LOCAL
  * block storage: fastest (no distributed filesystem round-trip), but the
  * blocks live only as long as their executor. On a real cluster, losing one
  * executor mid-iteration kills the whole job, because the truncated lineage
  * can no longer recompute the lost blocks — acceptable for short interactive
  * runs, not for a 100 TB multi-hour iterate.
  *
  * Passing `checkpointDir = Some(path)` switches every truncation point to a
  * RELIABLE checkpoint (`SparkContext.setCheckpointDir` +
  * `Dataset.checkpoint`), backed by any Hadoop filesystem — HDFS/object store
  * at cluster scale. Executor loss then costs a re-read of the checkpoint
  * files, not the job. The analytical results are BIT-IDENTICAL either way
  * (the strategy changes only WHERE the iterate is materialized, never its
  * value — CheckpointSpec proves equality per operator); the trade is
  * per-iteration write amplification for fault tolerance.
  *
  * Mirrors the reference's durable-state stance for long-running jobs
  * (checkpointed Flink state: streaming-ingestion-from-snowflake reference,
  * SnowflakeProcessFunction.java — operator state survives task loss), but
  * for batch iteration.
  */
final class Checkpointer(dir: Option[String]) extends Serializable {
  /** Truncate `df`'s lineage eagerly under the chosen strategy. */
  def apply(df: DataFrame): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir mints a fresh UUID subdir per call — only (re)set
      // when this Checkpointer's dir isn't the active one.
      if (!sc.getCheckpointDir.exists(_.contains(d))) sc.setCheckpointDir(d)
      df.checkpoint() // eager, reliable
    case None => df.localCheckpoint(true) // eager, executor-local
  }
}
