package graft.tools

import graft.core._
import graft.functions._
import graft.operators.NearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the near-dup path (dev tool, not part of
  * the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = table(spark, sfDir, "documents")
    val sets = NearDup.shingled(docs)
    time("shingled warm1")(sets.count())
    time("shingled warm2")(sets.count())
    time("minhashLshPairs warm1")(NearDup.minhashLshPairs(docs, 0.5).count())
    time("minhashLshPairs warm2")(NearDup.minhashLshPairs(docs, 0.5).count())
    time("simhashPairs warm1")(NearDup.simhashPairs(docs, 7).count())
    time("simhashPairs warm2")(NearDup.simhashPairs(docs, 7).count())
    time("exactJaccardPairs full")(NearDup.exactJaccardPairs(docs, 0.5).count())
    time("exactJaccardPairs again")(NearDup.exactJaccardPairs(docs, 0.5).count())
    spark.stop()
  }
}
