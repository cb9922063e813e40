package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** 2-D pareto frontier (skyline): the rows not dominated by any other row,
  * minimizing `x` while maximizing `y` (dominance: x' ≤ x ∧ y' ≥ y with at
  * least one strict). The classic price/quality trade-off query.
  *
  * Scale design (100 TB): the textbook NOT EXISTS dominance check is an
  * O(N²) self-join, and the textbook single-pass alternative — sort by x,
  * keep a running max of y — is `max(y) OVER (ORDER BY x)`, an unpartitioned
  * window that funnels the whole table through ONE task. This operator gets
  * the same answer with every partition working in parallel:
  *
  *   1. one hash shuffle collapses the table to a row per DISTINCT x with
  *      that group's max y (a frontier candidate; every row below its
  *      group's max y is dominated within the group);
  *   2. the strict-prefix max of y over ascending x is computed with the
  *      same two-job shape as [[PrefixSum]]: range-repartition by x, collect
  *      per-partition maxima (O(partitions) on the driver — bounded, not
  *      data-sized), broadcast each partition's strictly-earlier running
  *      max, then one streaming pass per partition;
  *   3. an x-group survives iff its max y strictly exceeds every
  *      cheaper group's max (prefix max), and the surviving groups join
  *      back to keep exactly the rows attaining their group's max — ties on
  *      (x, y) are mutually non-dominating, so all tied rows stay.
  *
  * Total cost: one aggregation shuffle + one range shuffle over the DISTINCT
  * x values + one hash join — no N² pair ever materializes.
  */
object Skyline {

  /** Pareto frontier of `df` minimizing long column `x`, maximizing long
    * column `y`. Rows with NULL in either column are excluded (NULL cannot
    * be compared under the dominance order). Output keeps `df`'s schema.
    */
  def frontier2D(df: DataFrame, x: String, y: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.filter(col(x).isNotNull && col(y).isNotNull)
    val g = in.groupBy(col(x)).agg(max(col(y)).as("__gy"))
    val sorted = g.repartitionByRange(col(x)).sortWithinPartitions(col(x))
    val schema = sorted.schema
    val yIdx = schema.fieldIndex("__gy")

    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // job 1: per-partition max of the group maxima (O(partitions) rows)
    val partMax: Array[(Int, Long)] = rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Long.MinValue
      var any = false
      it.foreach { r => any = true; val v = r.getLong(yIdx); if (v > m) m = v }
      if (any) Iterator((pid, m)) else Iterator.empty
    }.collect()
    // driver: running max over strictly-earlier partitions (range partitions
    // are ordered by x, the same contract PrefixSum relies on)
    var run = Long.MinValue
    val offsets: Map[Int, Long] = partMax.sortBy(_._1).map { case (pid, m) =>
      val o = pid -> run
      if (m > run) run = m
      o
    }.toMap
    val bc = spark.sparkContext.broadcast(offsets)
    // job 2: per-partition scan; a group survives iff its max y strictly
    // beats the running max over all strictly-smaller x
    val frontierRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = bc.value.getOrElse(pid, Long.MinValue)
      it.flatMap { r =>
        val gy = r.getLong(yIdx)
        val keep = gy > m
        if (keep) m = gy
        if (keep) Iterator(r) else Iterator.empty
      }
    }
    val frontierG = spark.createDataFrame(frontierRdd, schema)
    in.join(frontierG, in(x) === frontierG(x) && in(y) === frontierG("__gy"))
      .select(in.columns.toSeq.map(in(_)): _*)
  }
}
