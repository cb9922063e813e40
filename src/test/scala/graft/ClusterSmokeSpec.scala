package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[graft.tools.ClusterSmoke]] — the `local-cluster[2,2,*]`
  * multi-JVM serialization smoke (VERDICT r15 "Next round" #2) — as a
  * SEPARATE process: a JVM holds one SparkContext and the shared test
  * session is `local[8]`, so the cluster session cannot live in this JVM.
  * The child inherits this JVM's classpath (executors get it via
  * `spark.executor.extraClassPath` inside ClusterSmoke) and needs a Spark
  * DISTRIBUTION for the worker's executor-launcher (SPARK_HOME +
  * SPARK_SCALA_VERSION); both are derived here — from the environment, or
  * from the spark-core jar's location on the classpath. Skips (cancels)
  * when no distribution layout or too few cores, rather than green-washing.
  */
class ClusterSmokeSpec extends AnyFunSuite {

  private def findSparkHome(): Option[String] =
    sys.env.get("SPARK_HOME").filter(h => new java.io.File(h, "jars").isDirectory)
      .orElse {
        // .../spark-home/jars/spark-core_2.13-*.jar → spark-home
        System.getProperty("java.class.path")
          .split(java.io.File.pathSeparator)
          .find(p => p.contains("spark-core_") && p.endsWith(".jar"))
          .map(p => new java.io.File(p).getParentFile.getParentFile)
          .filter(h => new java.io.File(h, "jars").isDirectory)
          .map(_.getAbsolutePath)
      }

  test("local-cluster[2,2]: closures, broadcasts and codegen objects serialize across executor JVMs") {
    assume(Runtime.getRuntime.availableProcessors() >= 4,
      "cluster smoke needs >= 4 cores (2 workers x 2 cores)")
    val sparkHome = findSparkHome()
    assume(sparkHome.isDefined, "no Spark distribution (SPARK_HOME/jars) found")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val scalaMinor = scala.util.Properties.versionNumberString
      .split('.').take(2).mkString(".")
    // Spark 4 on JDK 17+ needs its module opens when launched outside
    // spark-submit — take them from Spark's own launcher so they stay in
    // sync (the worker injects them into executor JVMs by itself)
    val moduleOpens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split("\\s+").toSeq.filter(_.nonEmpty)
    val cmd = Seq(javaBin) ++ moduleOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.tools.ClusterSmoke", "1024")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome.get)
    pb.environment().put("SPARK_SCALA_VERSION", scalaMinor)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val pump = new Thread(() => {
      var line = reader.readLine()
      while (line != null) {
        out.synchronized { out.append(line).append('\n') }
        line = reader.readLine()
      }
    })
    pump.setDaemon(true)
    pump.start()
    val finished = proc.waitFor(8, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) proc.destroyForcibly()
    pump.join(5000)
    val log = out.synchronized(out.toString)
    assert(finished, s"cluster smoke timed out after 8 minutes:\n${log.takeRight(4000)}")
    assert(proc.exitValue() == 0,
      s"cluster smoke exited ${proc.exitValue()}:\n${log.takeRight(4000)}")
    assert(log.contains("CLUSTER-SMOKE OK 7"),
      s"missing success marker:\n${log.takeRight(4000)}")
  }
}
