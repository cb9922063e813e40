package graft.sinks

import graft.operators.Upsert
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-flavoured table management over parquet paths: the reference's
  * sink surface (IcebergTableManager.java:84-92 create-if-absent with identity
  * PartitionSpec; IcebergSinkBuilder.java:31-54 append / upsert-by-equality /
  * overwrite) without an Iceberg runtime.
  *
  * Identity partitioning maps to `partitionBy` (hive-style directories →
  * partition pruning on read). Upsert rewrites via a staging directory and an
  * atomic-ish rename so a failed job never leaves a half-written table.
  */
object GraftTableWriter {

  def append(df: DataFrame, path: String, partitions: Seq[String] = Nil): Unit =
    writer(df, partitions).mode(SaveMode.Append).parquet(path)

  def overwrite(df: DataFrame, path: String, partitions: Seq[String] = Nil): Unit =
    writer(df, partitions).mode(SaveMode.Overwrite).parquet(path)

  /** Equality-field upsert into an existing table (creates it when absent). */
  def upsert(df: DataFrame, path: String, keys: Seq[String],
      partitions: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    if (!exists(spark, path)) { overwrite(df, path, partitions); return }
    val merged = Upsert.upsert(spark.read.parquet(path), df, keys)
    val staging = path + "__staging"
    writer(merged, partitions).mode(SaveMode.Overwrite).parquet(staging)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(staging), new Path(path))
  }

  /** Version-aware upsert: keep, per equality key, the row ranking first
    * under `ordering` across BOTH the existing table and the update batch.
    * Unlike [[upsert]] (last-writer-wins), the result is independent of
    * arrival order — the correct merge for CDC streams whose micro-batch
    * ordering is not guaranteed.
    */
  def upsertVersioned(df: DataFrame, path: String, keys: Seq[String],
      ordering: Seq[org.apache.spark.sql.Column], partitions: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val unioned =
      if (exists(spark, path)) spark.read.parquet(path).unionByName(df) else df
    val merged = Upsert.latestByKey(unioned, keys, ordering)
    val staging = path + "__staging"
    writer(merged, partitions).mode(SaveMode.Overwrite).parquet(staging)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(staging), new Path(path))
    ()
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  def exists(spark: SparkSession, path: String): Boolean =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new Path(path))

  def drop(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    ()
  }

  private def writer(df: DataFrame, partitions: Seq[String]) = {
    val w = df.write
    if (partitions.nonEmpty) w.partitionBy(partitions: _*) else w
  }
}
