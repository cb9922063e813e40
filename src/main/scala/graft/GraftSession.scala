package graft

import org.apache.spark.sql.SparkSession

/** Session entry point for library users: builds (or decorates) a
  * SparkSession with graft's recommended configuration and registers the
  * custom SQL functions (minhash_signature, simhash64, word_shingles,
  * cosine_sim, …) so every operator is reachable from both the DataFrame API
  * and `spark.sql`.
  *
  * The config mirrors what the reference deployment tunes in Flink terms
  * (parallelism, checkpointing) re-expressed for Spark: AQE on for runtime
  * re-planning (skew joins, dynamic coalescing), shuffle partitions sized to
  * the cluster rather than the 200 default, UTC session time, and
  * nanos-as-long parquet reads for the event-time tables.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession.Builder = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else Runtime.getRuntime.availableProcessors()
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
  }

  /** Build the session and register graft's SQL functions. */
  def getOrCreate(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    functions.registerAll(spark)
    spark
  }

  /** Register graft's SQL functions on an existing session. */
  def install(spark: SparkSession): SparkSession = {
    functions.registerAll(spark)
    spark
  }
}
