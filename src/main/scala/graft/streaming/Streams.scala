package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming harness: stage a batch DataFrame as a file-source
  * directory, run a streaming transform over it with `Trigger.AvailableNow`
  * (bounded, deterministic micro-batching — `maxFilesPerTrigger=1` turns each
  * staged file into one micro-batch), and read the sink back as a DataFrame.
  *
  * This is the Spark-first shape of the reference's Flink topology
  * (SourceFunction → keyed process → sink, StreamingJob.java:96-116): the
  * source is declarative, state lives in the streaming aggregation /
  * `GroupState`, and the sink is transactional via the checkpoint +
  * `_spark_metadata` commit log rather than hand-rolled.
  */
object Streams {

  private def rmrf(path: String): Unit = {
    def go(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new File(path))
  }

  /** Fresh working dirs (src, out, checkpoint) for a named streaming run —
    * idempotent across Verify/Bench re-invocations. */
  def workDirs(name: String): (String, String, String) = {
    val base = s"/tmp/graft_stream/$name"
    rmrf(base)
    (s"$base/src", s"$base/out", s"$base/ck")
  }

  /** Stage `input` as `nFiles` parquet files and open it as a rate-limited
    * file-source stream (one staged file per micro-batch). */
  def stagedStream(input: DataFrame, srcDir: String, nFiles: Int): DataFrame = {
    input.repartition(nFiles).write.mode("overwrite").parquet(srcDir)
    val spark = input.sparkSession
    spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
  }

  /** Stage `batches` as sequential parquet files (one file per batch) with
    * STRICTLY INCREASING modification times, so a `maxFilesPerTrigger=1`
    * file-source stream replays them as micro-batches in exactly this
    * order. Sequential appends usually get increasing mod-times anyway;
    * the explicit `setTimes` (one minute apart) removes the
    * same-millisecond tie a fast local filesystem can produce, where the
    * source's (modTime, path) ordering would fall back to path order. */
  def stageOrderedBatches(batches: Seq[DataFrame], srcDir: String): DataFrame = {
    require(batches.nonEmpty, "stageOrderedBatches needs at least one batch")
    val spark = batches.head.sparkSession
    val fs = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (b, i) =>
      val before = listDataFiles(fs, srcDir)
      b.coalesce(1).write.mode("append").parquet(srcDir)
      (listDataFiles(fs, srcDir) -- before).foreach { p =>
        fs.setTimes(p, base + i * 60000L, -1)
      }
    }
    spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
  }

  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Set[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSet
  }

  /** Route streaming-checkpoint metadata writes through the FileSystem API
    * when the checkpoint lives on a LOCAL filesystem (r16, guide §7.3).
    * Spark's default FileContext-based checkpoint manager is the right
    * choice on HDFS/object stores (atomic rename guarantees), but on
    * RawLocalFileSystem its every rename routes through
    * `FileUtil.readLink`, which FORKS A SHELL PROCESS per call — measured
    * ~45 ms per offset-log write and another ~45 ms per commit-log write,
    * every micro-batch (thread dumps show the stream execution thread in
    * `Shell.runCommand` under `FileContextBasedCheckpointFileManager
    * .renameTempFile`). The FileSystem-based manager's local rename is
    * `File.renameTo` — atomic on a local FS, no fork. Scoped to local
    * paths only: cluster checkpoints (hdfs://, s3a://, …) never match and
    * keep the default manager. */
  def tuneLocalCheckpointManager(spark: SparkSession, ckDir: String): Unit = {
    val scheme = try new java.net.URI(ckDir).getScheme catch { case _: Exception => null }
    if (scheme == null || scheme == "file") spark.conf.set(
      "spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
  }

  /** Run a streamed transform to a parquet append sink until the backlog is
    * drained, then read the committed result back. */
  def runAppend(streamed: DataFrame, outDir: String, ckDir: String): DataFrame = {
    tuneLocalCheckpointManager(streamed.sparkSession, ckDir)
    val q = streamed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()
    q.awaitTermination()
    streamed.sparkSession.read.parquet(outDir)
  }

  /** Start a CONTINUOUS append run on a processing-time interval — the
    * reference's forever-polling timer loop
    * (SnowflakeProcessFunction.java:60-86). Unlike [[runAppend]] this returns
    * the live query without waiting: callers own stop/restart. Restarting
    * with the same `ckDir`/`outDir` resumes from the last committed batch
    * with exactly-once sink semantics (checkpoint + `_spark_metadata` commit
    * log) — the crash-recovery contract StreamingSpec exercises.
    */
  def startProcessingTime(streamed: DataFrame, outDir: String, ckDir: String,
      intervalMs: Long): org.apache.spark.sql.streaming.StreamingQuery = {
    tuneLocalCheckpointManager(streamed.sparkSession, ckDir)
    streamed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .outputMode("append")
      .start()
  }

  /** Run a streamed aggregation in complete mode through `foreachBatch`,
    * overwriting `outDir` each batch — the final batch holds the full result
    * (the `foreachBatch` + overwrite idiom for non-append sinks). */
  def runCompleteOverwrite(streamed: DataFrame, outDir: String, ckDir: String): DataFrame = {
    tuneLocalCheckpointManager(streamed.sparkSession, ckDir)
    val q = streamed.writeStream
      .outputMode("complete")
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    streamed.sparkSession.read.parquet(outDir)
  }
}
