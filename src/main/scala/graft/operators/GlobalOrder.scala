package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.{LongType, StructField}

/** Contiguous global row index in a total order — the primitive behind
  * epoch-stable corpus shuffling (assigning every document a position and
  * training-batch number) without the single-partition window that
  * `row_number() OVER (ORDER BY …)` degenerates to.
  *
  * Scale shape: `orderBy` is a RANGE exchange (sampled bounds, all
  * partitions sort in parallel); `zipWithIndex` then runs one lightweight
  * count job (per-partition sizes → prefix offsets, O(partitions) on the
  * driver) and one map job adding the offsets. No stage ever sees more than
  * one partition's rows. The sorted RDD is persisted across the two jobs so
  * the sort runs once.
  *
  * Determinism: callers must pass a TOTAL order (tie-break on a unique id) —
  * then the index is independent of input partitioning and rerun-stable.
  * This is the one sanctioned RDD drop-out besides mapPartitions batching:
  * contiguous numbering is inherently a two-pass per-partition-offset
  * computation, which is exactly what `zipWithIndex` implements.
  */
object GlobalOrder {

  def withGlobalIndex(df: DataFrame, order: Seq[Column], out: String = "row_idx"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val indexed = rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, sorted.schema.add(StructField(out, LongType, nullable = false)))
  }
}
