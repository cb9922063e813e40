package graft.tools
import graft.sources.ShardedIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Recorded A/B (SURVEY §4 offset_page_ab, r12): the per-shard OFFSET page
  * read with vs without the constant-bound rank prefilter that lets
  * InferWindowGroupLimit plant a partial top-k below the window's exchange.
  * `old` is the pre-r12 shape (the non-constant per-shard offset filter
  * alone — shuffles the full scan); `new` is ShardedIngest.page as shipped.
  * Measured at sf0.1/local[32], min-of-5 warm: 0.454 s -> 0.329 s (1.38x),
  * identical pages. */
object OffsetAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val offsets = Map("click" -> 120L, "view" -> 260L, "purchase" -> 60L)
    def base = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"event_id", $"event_type", graft.core.micros($"ts").as("tsu"))
    def oldPage() = { // the pre-r12 shape: no constant prefilter
      val w = Window.partitionBy($"event_type").orderBy($"tsu", $"event_id")
      val off = coalesce(element_at(typedLit(offsets), $"event_type"), lit(0L))
      base.withColumn("page_rn", row_number().over(w).cast(LongType))
        .withColumn("__off", off)
        .filter($"page_rn" > $"__off" && $"page_rn" <= $"__off" + 400L)
        .drop("__off").orderBy($"event_type", $"page_rn")
    }
    def newPage() = ShardedIngest.page(base, "event_type",
      Seq("tsu", "event_id"), offsets, 400L).orderBy($"event_type", $"page_rn")
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    oldPage().count(); newPage().count() // warm
    val olds = (1 to 5).map(_ => t(oldPage().count()))
    val news = (1 to 5).map(_ => t(newPage().count()))
    println(f"old(min-of-5)=${olds.min}%.3f new(min-of-5)=${news.min}%.3f  old=$olds  new=$news")
    // 1x/10x/30x amortization curve: the bench pin sits ~1.35x at sf0.1
    // because FIXED overhead (job scheduling, file listing, the final tiny
    // sort) dominates a 0.3-0.4 s query; at 10x/30x the scan grows linearly
    // while the overhead and the group-limited shuffle (O(shards x bound))
    // do not, so wall must grow FAR slower than data (recorded in SURVEY §4)
    for (k <- Seq(1, 10, 30)) {
      val staged = s"/tmp/graft_scale/events_page_x$k"
      val fs = new org.apache.hadoop.fs.Path(staged)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(staged))) {
        (0 until k).map(r => base.withColumn("event_id",
            $"event_id" + lit(r * 1000000000L)))
          .reduce(_ unionByName _).write.mode("overwrite").parquet(staged)
      }
      def paged() = ShardedIngest.page(
        spark.read.parquet(staged), "event_type",
        Seq("tsu", "event_id"), offsets, 400L).count()
      paged() // warm
      val runs = (1 to 3).map(_ => t(paged()))
      println(f"scale x$k: min-of-3 ${runs.min}%.3f  runs=$runs")
    }
    spark.stop()
  }
}
