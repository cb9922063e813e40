package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the RegexCountRewrite claim: token counting as
  * `size(regexp_extract_all(lower(text), '[a-z]+', 0))` (materializes an
  * array<string> of every match per row) vs the injected `count_matches`
  * expression (same `Matcher.find()` loop, no array). Both variants run the
  * identical aggregation (`sum` + `avg` of the count over the documents
  * table repeated `copies`×) so scan/agg cost is shared and the delta
  * isolates the expression. The array variant is evaluated in a session
  * WITHOUT the optimizer rule (a plain builder), because in a GraftSession
  * the rewrite would silently turn it into the fast path and measure
  * nothing.
  *
  * Usage: `runMain graft.tools.RegexBench [copies]`. Prints one JSON line.
  */
object RegexBench {

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(200)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // plain session: no extensions, so the slow variant stays slow
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark) // registers count_matches (function only, no rule)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).cache()
    docs.count()
    // replicate the corpus without re-reading parquet
    val big = (1 to copies).map(_ => docs).reduce(_ union _)

    def run(expr0: org.apache.spark.sql.Column): (Double, Long) = {
      val (t, r) = time(big.select(expr0.as("n")).agg(sum("n")).head().getLong(0))
      (t, r)
    }

    // warm both paths once, then measure
    val slowE = size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
    val fastE = expr("count_matches(lower(text), '[a-z]+')")
    run(slowE); run(fastE)
    val (tSlow, nSlow) = run(slowE)
    val (tFast, nFast) = run(fastE)
    require(nSlow == nFast, s"count mismatch: $nSlow vs $nFast")
    println(s"""{"metric":"regex_count","slow_sec":$tSlow,"fast_sec":$tFast,""" +
      s""""speedup":${tSlow / tFast},"tokens":$nSlow,"copies":$copies}""")
    spark.stop()
  }
}
