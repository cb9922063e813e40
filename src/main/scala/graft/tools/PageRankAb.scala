package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for PageRank's dangling-mass mechanics (SURVEY §4): the r6
  * collect-a-scalar design vs the r7 `crossJoin(broadcast(one-row))`
  * re-entry, interleaved k rounds each in one JVM, per-variant MIN reported.
  * Run: `sbt "runMain graft.tools.PageRankAb /root/testdata/sf0.1 3"`.
  */
object PageRankAb {
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
    // the A/B must arbitrate the exact graph the registered query runs on —
    // reuse Graph's own edge builder instead of a drifting re-implementation
    def run(broadcastDang: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.PageRank.run(
        graft.queries.Graph.edges(spark, sfDir), iters = 4,
        dangBroadcast = broadcastDang).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(false); run(true) // warm-up both paths
    val times = (1 to rounds).map(_ => (run(false), run(true)))
    val (collectMin, bcastMin) = (times.map(_._1).min, times.map(_._2).min)
    println(f"""{"collect_dang_min_s":$collectMin%.3f,"broadcast_dang_min_s":$bcastMin%.3f,"rounds":${times.map(t => f"[${t._1}%.3f,${t._2}%.3f]").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
