package graft.tools

import org.apache.spark.sql.SparkSession

/** Recorded A/B (SURVEY §4 exact_substr_hash_ab, r15 — VERDICT r14 "Next
  * round" #1): ExactSubstr's one big shuffle keyed by the 128-bit gram HASH
  * (two xxhash64 lanes over the token-array window, 16-byte keys) vs the
  * r14 string-gram key (the 8-token gram text). Same plan shape — the A/B
  * isolates the wire format of the gram count + positions join. Span sets
  * are asserted identical (the ExactSubstrSpec equivalence, re-checked
  * here on the full corpus). Run with the sf dir as arg 1.
  */
object ExactSubstrAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // total shuffle-WRITE bytes per run — the quantity the hash key exists
    // to shrink (wall time at test SF is scan/codegen-bound; the wire
    // format is what scales with corpus size)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(hashed: Boolean): Long =
      graft.operators.ExactSubstr.duplicateSpans(docs, 8, hashGramKey = hashed).count()
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val nh = run(true); val ns = run(false) // warm + row-count equivalence
    require(nh == ns, s"span counts diverge: hashed $nh vs string $ns")
    def bytesOf(f: => Unit): Long = {
      shuffleBytes.set(0L); f
      Thread.sleep(1500) // listener bus drains asynchronously (public API only)
      shuffleBytes.get()
    }
    val hashBytes = bytesOf(run(true))
    val stringBytes = bytesOf(run(false))
    val hs = (1 to 5).map(_ => t(run(true)))
    val ss = (1 to 5).map(_ => t(run(false)))
    println(f"""{"ab":"exact_substr_hash","sf":"$sfDir","spans":$nh,""" +
      f""""hash_min_s":${hs.min}%.3f,"string_min_s":${ss.min}%.3f,""" +
      f""""speedup":${ss.min / hs.min}%.2f,""" +
      s""""hash_shuffle_bytes":$hashBytes,"string_shuffle_bytes":$stringBytes,""" +
      f""""shuffle_ratio":${stringBytes.toDouble / math.max(hashBytes, 1L)}%.2f,""" +
      s""""hash_rounds":[${hs.map(x => f"$x%.3f").mkString(",")}],""" +
      s""""string_rounds":[${ss.map(x => f"$x%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
