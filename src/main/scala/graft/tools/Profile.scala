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
    val inv = sets.select(col("doc_id"), size(col("shingles")).as("n_sh"),
      explode(col("shingles")).as("shingle"))
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("df", "shingle")
    val prefix = inv.join(broadcast(dfreq), "shingle")
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * 0.5) + 1)
      .select(col("doc_id"), col("n_sh"), col("shingle"), col("rk"))
    time("prefix")(println("  " + prefix.count()))
    time("prefix again")(println("  " + prefix.count()))
    val tauOverlap = 0.5 / 1.5
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id")
          && col("b.n_sh") * 0.5 <= col("a.n_sh")
          && col("a.n_sh") * 0.5 <= col("b.n_sh"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(min(col("a.rk")).as("pa"), min(col("b.rk")).as("pb"),
        first(col("a.n_sh")).as("na"), first(col("b.n_sh")).as("nb"))
    time("pair agg rows")(println("  " + cand.count()))
    val filtered = cand.filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
        >= ceil((col("na") + col("nb")) * tauOverlap))
      .select(col("id_a"), col("id_b"))
    time("cand after position filter")(println("  " + filtered.count()))
    time("full warm1")(NearDup.exactJaccardPairs(docs, 0.5).count())
    time("full warm2")(NearDup.exactJaccardPairs(docs, 0.5).count())
    // how much of the full run is re-deriving `sets` 3x? (shingle once,
    // localCheckpoint, rebuild the same pipeline on the materialized sets)
    time("shingle+checkpoint") {
      val cached = NearDup.shingled(docs).localCheckpoint(true)
      val inv2 = cached.select(col("doc_id"), size(col("shingles")).as("n_sh"),
        explode(col("shingles")).as("shingle"))
      val dfreq2 = inv2.groupBy("shingle").agg(count(lit(1)).as("df"))
      val prefix2 = inv2.join(dfreq2, "shingle")
        .withColumn("rk", row_number().over(wDoc))
        .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * 0.5) + 1)
        .select(col("doc_id"), col("n_sh"), col("shingle"), col("rk"))
      val cand2 = prefix2.as("a").join(prefix2.as("b"),
          col("a.shingle") === col("b.shingle")
            && col("a.doc_id") < col("b.doc_id")
            && col("b.n_sh") * 0.5 <= col("a.n_sh")
            && col("a.n_sh") * 0.5 <= col("b.n_sh"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(min(col("a.rk")).as("pa"), min(col("b.rk")).as("pb"),
          first(col("a.n_sh")).as("na"), first(col("b.n_sh")).as("nb"))
        .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))
          >= ceil((col("na") + col("nb")) * tauOverlap))
        .select(col("id_a"), col("id_b"))
      val a = cached.select(col("doc_id").as("id_a"), col("shingles").as("sa"))
      val b = cached.select(col("doc_id").as("id_b"), col("shingles").as("sb"))
      val verified = cand2.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_common"))
        .filter(col("n_common") > 0)
      println("  " + verified.count())
    }
    spark.stop()
  }
}
