package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual `SparkEntry.queries` by name (warm-up +
  * timed run each, the same protocol as [[graft.Bench]]) without running the
  * whole headline set. `runMain graft.tools.QTime q1_pricing_summary ...`;
  * scale dir from SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ad-hoc experiments: SPARK_EXTRA_CONF="key=value;key=value"
    sys.env.get("SPARK_EXTRA_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val durs = java.util.Collections.synchronizedList(new java.util.ArrayList[Double]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, j.time)
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobs.get(j.jobId)).foreach(t0 => durs.add((j.time - t0) / 1e3))
    })
    val verbose = sys.env.contains("QTIME_JOBS")
    val qs = graft.SparkEntry.queries
    // mirror graft.Bench's r16 measurement hygiene: no cached plan or
    // persistent RDD survives between invocations, so the timed run cannot
    // read the warm-up run's persisted intermediates
    def dropCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    args.foreach { name =>
      qs.get(name) match {
        case Some(fn) =>
          fn(spark, sfDir).count()
          dropCaches()
          durs.clear()
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          Thread.sleep(100) // let listener events drain
          val ds = durs.toArray(Array.empty[java.lang.Double]).map(_.doubleValue)
          println(f"QTIME $name%-35s $secs%8.3f s  ($n rows, ${ds.length} jobs, " +
            f"job-time ${ds.sum}%.2f s)")
          if (verbose) println("  jobs: " + ds.map(d => f"$d%.2f").mkString(", "))
          dropCaches()
        case None => println(s"QTIME $name UNKNOWN")
      }
    }
    spark.stop()
  }
}
