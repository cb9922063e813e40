package graft.tools

import graft.GraftSession
import graft.functions.topk_pairs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the bounded-state TopKPairs aggregate against the
  * `row_number() OVER (...)` window under group skew. Synthetic table:
  * `nGroups` uniform groups plus one hot group holding `hotShare` of all
  * rows (the viral-event / dominant-domain shape).
  *
  * Finding (recorded in SURVEY.md §4): Spark 4's WindowGroupLimit pushdown
  * (SPARK-37099) bounds the rank-filter window map-side too — its exchange
  * carries k rows per (map partition, group) instead of every row, so wall
  * times match within noise on one host and the aggregate's measured edge
  * is k× fewer shuffle records (one O(k) state vs k rows per map-partition
  * group) plus the grouped-array output shape. The per-stage record counts
  * below are what demonstrate this; wall alone would mislead either way.
  *
  * Usage: `runMain graft.tools.TopKBench [rows] [hotShare]`. Prints one
  * JSON line per variant.
  */
object TopKBench {

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotShare = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val nGroups = 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)

    // id-hash priorities; group 0 is hot. Stage to parquet so both variants
    // read identical input with no generation cost in the timings.
    val hotCut = (hotShare * 2147483647L).toLong
    val src = "/tmp/graft_topk_bench"
    spark.range(rows)
      .select(col("id").as("v"),
        when(pmod(hash(col("id")), lit(2147483647L)) < hotCut, lit(0L))
          .otherwise(pmod(hash(col("id"), lit(7)), lit(nGroups.toLong))).as("g"),
        pmod(hash(col("id"), lit(13)), lit(1000000007L)).as("p"))
      .write.mode("overwrite").parquet(src)
    val df = spark.read.parquet(src)

    def viaAgg(d: DataFrame): Long =
      d.groupBy(col("g")).agg(topk_pairs(col("p"), col("v"), 10).as("tk"))
        .select(explode(col("tk"))).count()
    def viaWindow(d: DataFrame): Long =
      d.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("p"), col("v"))))
        .filter(col("rn") <= 10).count()

    // the cluster-relevant facts are shuffle records/bytes and the max task
    // duration (straggler), measured per job below — wall time on one host
    // discriminates neither variant
    val shuffle = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) {
          shuffle.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          maxTaskMs.updateAndGet(m => math.max(m, te.taskInfo.duration))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sys.env.contains("TOPK_BENCH_STAGES"))
          println(s"stage ${sc.stageInfo.stageId} '${sc.stageInfo.name.takeWhile(_ != '\n')}' " +
            s"tasks=${sc.stageInfo.numTasks} " +
            s"shuffleWriteMB=${sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576} " +
            s"recordsWritten=${sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten}")
    })
    val warm = sys.env.get("TOPK_BENCH_NO_WARM").isEmpty
    for ((name, f) <- Seq("topk_agg" -> viaAgg _, "window" -> viaWindow _)) {
      if (warm) f(df)
      Thread.sleep(500); shuffle.set(0); maxTaskMs.set(0)
      val (sec, n) = time(f(df))
      Thread.sleep(500) // let the listener bus drain
      println(s"""{"variant":"$name","rows":$rows,"hot_share":$hotShare,"sec":${f"$sec%.2f"},""" +
        s""""out_rows":$n,"shuffle_mb":${shuffle.get / 1048576},"max_task_sec":${f"${maxTaskMs.get / 1000.0}%.2f"}}""")
    }
    spark.stop()
  }
}
