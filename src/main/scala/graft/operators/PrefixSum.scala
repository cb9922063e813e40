package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed running total (prefix sum / scan) — the scale-correct
  * replacement for `sum(x) OVER (PARTITION BY g ORDER BY …)` when a group
  * can span terabytes: a plain window funnels each group through ONE task,
  * while this computes the identical result with every partition working in
  * parallel.
  *
  * Shape: range-repartition on (group, order) so each partition holds a
  * contiguous slice of the total order; job 1 collects per-(partition,
  * group) sums (O(partitions × groups) on the driver — partitions and
  * group cardinality are both bounded, not data-sized); the driver turns
  * them into per-(partition, group) starting offsets, broadcasts the map,
  * and job 2 streams each partition once adding the running value. The
  * sorted RDD is persisted across the two jobs so the sort runs once.
  *
  * Order must be TOTAL within each group (tie-break on a unique id) for the
  * result to be partitioning-independent — same contract as [[GlobalOrder]].
  */
object PrefixSum {

  def groupedRunningTotal(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: String,
      out: String = "running_total"): DataFrame = {
    val spark = df.sparkSession
    val sortCols: Seq[Column] = group.map(df.col) ++ order
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val gIdx = group.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(value)
    require(schema(vIdx).dataType == LongType,
      s"value column '$value' must be LongType (cast upstream)")
    def key(r: Row): Seq[Any] = gIdx.map(r.get)

    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)

    // job 1: per-(partition, group) sums
    val partials: Array[(Int, Map[Seq[Any], Long])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          val k = key(r)
          acc.update(k, acc.getOrElse(k, 0L) + r.getLong(vIdx))
        }
        Iterator((pid, acc.toMap))
      }
      .collect()

    // driver: starting offset of each group in each partition = sum of that
    // group's totals over all earlier partitions
    val byPid = partials.sortBy(_._1)
    val running = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    val offsets: Map[Int, Map[Seq[Any], Long]] = byPid.map { case (pid, sums) =>
      val start = sums.keys.map(k => k -> running.getOrElse(k, 0L)).toMap
      sums.foreach { case (k, s) => running.update(k, running.getOrElse(k, 0L) + s) }
      pid -> start
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)

    // job 2: one streaming pass per partition adding the running value
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      bc.value.getOrElse(pid, Map.empty).foreach { case (k, v) => acc.update(k, v) }
      it.map { r =>
        val k = key(r)
        val cum = acc.getOrElse(k, 0L) + r.getLong(vIdx)
        acc.update(k, cum)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark.createDataFrame(indexed, schema.add(StructField(out, LongType, nullable = false)))
  }
}
