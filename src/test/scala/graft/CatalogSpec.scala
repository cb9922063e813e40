package graft

import graft.sinks.{GraftCatalog, HadoopPathCatalog, VersionedTable}
import org.apache.spark.sql.SparkSession

/** The catalog seam (r14): every VersionedTable commit / resolution routes
  * through [[GraftCatalog]]. A counting, fault-injecting wrapper proves the
  * seam is load-bearing — all commits pass through it, an injected
  * optimistic-swap loss is retried safely (no lost or duplicated commit),
  * and concurrent writers through the wrapper serialize exactly like the
  * direct protocol (the torture soak's guarantees hold through the seam).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  /** Delegating wrapper: counts calls, and rejects each FIRST commit
    * attempt per version when `injectLoss` — the remote-catalog contention
    * signature (a requirement check failing server-side). */
  private final class CountingCatalog(injectLoss: Boolean) extends GraftCatalog {
    val loads = new java.util.concurrent.atomic.AtomicLong()
    val commits = new java.util.concurrent.atomic.AtomicLong()
    val rejected = new java.util.concurrent.atomic.AtomicLong()
    private val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def loadTable(s: SparkSession, t: String): Option[(Int, String)] = {
      loads.incrementAndGet(); HadoopPathCatalog.loadTable(s, t)
    }
    def commitTable(s: SparkSession, t: String, expected: Int, json: String): Boolean = {
      commits.incrementAndGet()
      if (injectLoss && seen.add(s"$t#$expected")) {
        rejected.incrementAndGet(); false // simulated lost optimistic swap
      } else HadoopPathCatalog.commitTable(s, t, expected, json)
    }
    def tableVersions(s: SparkSession, t: String): Seq[Int] =
      HadoopPathCatalog.tableVersions(s, t)
    def readVersion(s: SparkSession, t: String, v: Int): Option[String] =
      HadoopPathCatalog.readVersion(s, t, v)
  }

  private def withCatalog[T](c: GraftCatalog)(body: => T): T = {
    val prev = VersionedTable.catalog
    VersionedTable.catalog = c
    try body finally VersionedTable.catalog = prev
  }

  private def fresh(name: String): String = {
    val p = s"/tmp/graft_tables/catalog_spec_$name"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("every commit and resolution passes through the seam") {
    val p = fresh("count")
    val c = new CountingCatalog(injectLoss = false)
    withCatalog(c) {
      VersionedTable.append(Seq((1L, "a")).toDF("id", "v"), p)
      VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), p)
      VersionedTable.upsertMor(Seq((1L, "a2")).toDF("id", "v"), p, Seq("id"))
      assert(VersionedTable.versions(spark, p) == Seq(1, 2, 3))
      assert(VersionedTable.read(spark, p).count() == 2)
    }
    assert(c.commits.get() == 3, s"expected 3 commits through the seam, saw ${c.commits.get()}")
    assert(c.loads.get() >= 3) // every commit resolves current state first
  }

  test("injected optimistic-swap losses retry safely: no lost, no duplicated commit") {
    val p = fresh("inject")
    val c = new CountingCatalog(injectLoss = true)
    withCatalog(c) {
      VersionedTable.append(Seq((1L, "a")).toDF("id", "v"), p)   // first try rejected
      VersionedTable.append(Seq((2L, "b")).toDF("id", "v"), p)
      assert(VersionedTable.versions(spark, p) == Seq(1, 2))
      val rows = VersionedTable.read(spark, p).as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "a"), (2L, "b")))
    }
    assert(c.rejected.get() >= 2, "each version's first attempt must have been rejected")
    assert(c.commits.get() >= 4) // ≥ one retry per commit
  }

  test("concurrent writers through the seam serialize like the direct protocol") {
    val p = fresh("conc")
    val c = new CountingCatalog(injectLoss = false)
    withCatalog(c) {
      val threads = (1 to 8).map { i =>
        new Thread(() =>
          VersionedTable.append(Seq((i.toLong, s"w$i")).toDF("id", "v"), p))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(VersionedTable.versions(spark, p) == (1 to 8))
      val rows = VersionedTable.read(spark, p).as[(Long, String)].collect().toSet
      assert(rows == (1 to 8).map(i => (i.toLong, s"w$i")).toSet,
        "every concurrent append must land exactly once")
    }
    assert(c.commits.get() == 8)
  }
}
