package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark (SURVEY.md §6): one warm-up + one timed run per query
  * at the driver-provided scale factor, one JSON line on stdout.
  * Timing is end-to-end plan execution (`count()` materializes the full
  * result without collecting it to the driver).
  */
object Bench {
  private val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q15_topk_orders", "q16_time_bucket",
    "dedup_exact", "dedup_minhash_lsh", "ngram_jaccard_pairs",
    "embedding_cosine_topk", "text_token_count", "text_langid",
    "upsert_merge", "incremental_offset_read", "pipeline_training_data")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val results = headline.flatMap { name =>
      qs.get(name).map { fn =>
        try {
          fn(spark, sfDir).count() // warm-up: JIT + codegen + file listing
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
        }
      }
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
