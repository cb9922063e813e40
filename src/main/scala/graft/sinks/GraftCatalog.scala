package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Minimal CATALOG interface over graft tables (r14, VERDICT r13 "Next
  * round" #7) — the Iceberg REST-catalog shape (loadTable +
  * commitTable-with-requirements) reduced to its load-bearing core: a
  * commit names the version it expects to supersede, and the catalog
  * accepts it iff that is still the current version (optimistic swap).
  * This is what a real deployment hits first when two writers share a
  * TABLE NAME rather than a directory path — the reference gets it from
  * AWS Glue (IcebergTableManager.java:31-38, getDefaultCatalogProperties);
  * graft's default implementation is the version-hint file protocol
  * ([[HadoopPathCatalog]]: rename-as-commit claims the version file), and
  * every [[VersionedTable]] commit / latest-snapshot resolution routes
  * through this seam, so swapping in a remote catalog is one object.
  *
  * Scope: snapshot resolution and the commit point ONLY. Storage-level
  * maintenance (expire's file deletion, versionAsOf's mtime clock, orphan
  * GC) stays on the storage layer beneath the catalog — exactly where it
  * lives for a REST catalog too.
  */
trait GraftCatalog {
  /** The table's latest committed (version, manifestJson); None when the
    * table has no snapshots. */
  def loadTable(spark: SparkSession, table: String): Option[(Int, String)]

  /** Optimistic commit of version `expectedVersion + 1`: true iff THIS
    * writer won the claim — i.e. the table was still at `expectedVersion`
    * and no concurrent committer took the slot (the REST catalog's
    * assert-ref-snapshot-id requirement). A false is not an error: the
    * caller re-plans against the new current snapshot and retries. */
  def commitTable(spark: SparkSession, table: String, expectedVersion: Int,
      manifestJson: String): Boolean

  /** All committed versions, ascending. */
  def tableVersions(spark: SparkSession, table: String): Seq[Int]

  /** The manifest JSON of one committed version, if it exists. */
  def readVersion(spark: SparkSession, table: String, version: Int): Option[String]
}

/** The version-hint file protocol as a catalog: the table name IS a
  * directory path, versions are `_graft_meta/vNNNNN.json` manifest files,
  * and the optimistic swap is rename-as-commit — a filesystem rename onto
  * a name only one writer can claim (the HadoopCatalog convention). */
object HadoopPathCatalog extends GraftCatalog {
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaDir(table: String) = new Path(table, VersionedTable.MetaDir)

  private def manifestName(v: Int): String = f"v$v%05d.json"

  private def listVersions(spark: SparkSession, table: String): Seq[(Int, Path)] = {
    val filesystem = fs(spark, table)
    val meta = metaDir(table)
    if (!filesystem.exists(meta)) return Nil
    filesystem.listStatus(meta).toSeq.map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("v") && n.endsWith(".json"))
          n.stripPrefix("v").stripSuffix(".json").toIntOption.map(_ -> p)
        else None
      }
      .sortBy(_._1)
  }

  private def readBytes(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p.toString).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  def loadTable(spark: SparkSession, table: String): Option[(Int, String)] =
    listVersions(spark, table).lastOption.map { case (v, p) =>
      v -> readBytes(spark, p)
    }

  def commitTable(spark: SparkSession, table: String, expectedVersion: Int,
      manifestJson: String): Boolean = {
    val filesystem = fs(spark, table)
    val meta = metaDir(table)
    filesystem.mkdirs(meta)
    val v = expectedVersion + 1
    val tmp = new Path(meta,
      s".tmp-${System.nanoTime()}-${counter.incrementAndGet()}")
    val out = filesystem.create(tmp, false)
    out.write(manifestJson.getBytes("UTF-8"))
    out.close()
    val dst = new Path(meta, manifestName(v))
    // rename-as-commit: only one writer can claim v; a loser cleans up
    if (!filesystem.exists(dst) && filesystem.rename(tmp, dst)) true
    else { filesystem.delete(tmp, false); false }
  }

  def tableVersions(spark: SparkSession, table: String): Seq[Int] =
    listVersions(spark, table).map(_._1)

  def readVersion(spark: SparkSession, table: String, version: Int): Option[String] = {
    // probe the single deterministic manifest path — a full _graft_meta
    // listing per lookup is O(versions) on long-history tables (ADVICE r14)
    val p = new Path(metaDir(table), manifestName(version))
    val filesystem = fs(spark, table)
    if (filesystem.exists(p)) Some(readBytes(spark, p)) else None
  }
}
