package graft.tools

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the banded-DBSCAN candidate dedup (SURVEY §4): the r10
  * shape deduplicated (id_a, id_b) while still CARRYING both quantized
  * vectors — O(collisions × dim) longs through the dedup shuffle — vs the
  * r11 shape that dedups the BARE id pairs and re-attaches the vectors by
  * two narrow equi-joins. Both produce the identical ε-neighbor list
  * (asserted). Run: `sbt "runMain graft.tools.DbscanAb /root/testdata/sf0.1 3"`.
  */
object DbscanAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (epsSq, scale, numTables, numBits, seedBase) = (1300000L, 1000L, 8, 4, 5000)
    def vectors: DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def quantized: DataFrame = vectors.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => floor(x * scale + 0.5).cast("long")).as("v"))
    def bucketed: DataFrame = vectors.select(col("vec_id"),
        posexplode(array((0 until numTables).map(t =>
          sign_random_projection_poly(col("embedding"), numBits, seedBase + t)): _*)))
      .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "bucket"))
    def verify(pairs: DataFrame): Long = pairs
      .withColumn("d2",
        aggregate(zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, t) => acc + t))
      .filter(col("d2") <= epsSq)
      .count()

    // r10 shape: vectors ride INTO the dedup shuffle
    def wide(): Long = {
      val q = quantized
      val b = bucketed
        .join(q.select(col("vec_id"), col("v")), "vec_id")
      val cand = b.as("a").join(b.as("b"), Seq("tbl", "bucket"))
        .filter(col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          col("a.v").as("va"), col("b.v").as("vb"))
        .dropDuplicates("id_a", "id_b")
      verify(cand)
    }
    // r11 shape: dedup bare id pairs, re-join vectors after
    def narrow(): Long = {
      val b = bucketed
      val cand = b.as("a").join(b.as("b"), Seq("tbl", "bucket"))
        .filter(col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val q = quantized
      verify(cand
        .join(q.select(col("vec_id").as("id_a"), col("v").as("va")), Seq("id_a"))
        .join(q.select(col("vec_id").as("id_b"), col("v").as("vb")), Seq("id_b")))
    }
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (w0, n0) = time(wide); val (nr0, n1) = time(narrow) // warm-up
    require(n0 == n1, s"variants disagree: $n0 vs $n1")
    val times = (1 to rounds).map(_ => (time(wide)._1, time(narrow)._1))
    println(f"""{"wide_dedup_min_s":${times.map(_._1).min}%.3f,"narrow_dedup_min_s":${times.map(_._2).min}%.3f,"pairs":$n0,"warmup":[$w0%.3f,$nr0%.3f],"rounds":${times.map(t => f"[${t._1}%.3f,${t._2}%.3f]").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
