package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed interval join — the scale path for point-in-interval joins
  * where BOTH sides are large.
  *
  * A non-equi `points ⋈ intervals ON p >= lo AND p < hi` gives Catalyst no
  * equi-key, so the physical plan is BroadcastNestedLoopJoin (needs the whole
  * interval table on every executor) or a cartesian product — O(N·M) compares
  * either way. Fine for q19's 3-row band table; fatal when the intervals are
  * themselves a fact table (sensor calibration windows, price validity
  * ranges, IP→geo blocks) with millions of rows.
  *
  * The classic fix (used by every distributed spatial join): overlay a fixed
  * grid of width `w`.
  *  - each point belongs to exactly ONE cell: `floor(p / w)`;
  *  - each interval is replicated onto the O(len/w + 1) cells it overlaps:
  *    `sequence(floor(lo/w), floor(hi/w))`;
  *  - equi-join on the cell id, then re-check the exact `[lo, hi)` predicate.
  *
  * Every matching pair meets exactly once (the point's single cell is one of
  * the interval's cells), so no post-join dedup is needed, and non-matching
  * pairs outside the same cell are never materialized. One shuffle keyed by
  * cell; cell skew (a hot value range) falls to AQE's skew-join split. The
  * replication factor is bounded by `maxCellsPerInterval` so a degenerate
  * whole-axis interval cannot explode the build side silently.
  */
object RangeJoin {

  /** Join `points` to every interval row whose `[loCol, hiCol)` contains
    * `pointCol`. Output columns = points ++ intervals (names must be
    * disjoint). `bucketWidth` trades replication (long intervals span more
    * cells) against co-occupancy (wide cells pair more non-matches); set it
    * near the typical interval length.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double,
      maxCellsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"range join: column names [${clash.mkString(", ")}] appear on both sides")
    def cell(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__cell", cell(col(pointCol)))
    val i = intervals
      .withColumn("__lo_cell", cell(col(loCol)))
      .withColumn("__hi_cell", cell(col(hiCol)))
      .withColumn("__span", col("__hi_cell") - col("__lo_cell") + lit(1L))
    // Fail loudly instead of silently replicating a degenerate interval
    // thousands of times: the guard is itself distributed (no collect).
    val exploded = i
      .withColumn("__cell", explode(
        when(col("__span") <= lit(maxCellsPerInterval.toLong),
          sequence(col("__lo_cell"), col("__hi_cell")))
          .otherwise(raise_error(concat(
            lit(s"range join: interval spans more than $maxCellsPerInterval cells of width $bucketWidth: ["),
            col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"), lit(")"))))))
      .drop("__lo_cell", "__hi_cell", "__span")
    p.join(exploded, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }

  /** Interval×interval OVERLAP join (`aLo < bHi && bLo < aHi`, half-open) —
    * the two-sided generalization of [[pointInInterval]]: both sides
    * replicate onto the grid cells they span and equi-join on the cell
    * (plus any `keys`). Because two overlapping intervals can share MANY
    * cells, naively joining would emit duplicates; instead of a distinct
    * (an extra shuffle over the full result), each pair is kept only in its
    * canonical REFERENCE CELL — the cell of `greatest(aLo, bLo)`, which
    * both sides provably replicate onto whenever they overlap — so every
    * qualifying pair meets exactly once by construction. One shuffle keyed
    * by (keys, cell); replication bounded by `maxCellsPerInterval`.
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      bucketWidth: Double,
      keys: Seq[String] = Nil,
      maxCellsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = a.columns.toSet.intersect(b.columns.toSet) -- keys
    require(clash.isEmpty,
      s"interval overlap join: column names [${clash.mkString(", ")}] appear on both sides")
    def cell(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    def onCells(df: DataFrame, lo: String, hi: String): DataFrame = {
      val spanned = df
        .withColumn("__lo_cell", cell(col(lo)))
        .withColumn("__hi_cell", cell(col(hi)))
        .withColumn("__span", col("__hi_cell") - col("__lo_cell") + lit(1L))
      spanned.withColumn("__cell", explode(
          when(col("__span") <= lit(maxCellsPerInterval.toLong),
            sequence(col("__lo_cell"), col("__hi_cell")))
            .otherwise(raise_error(concat(
              lit(s"interval overlap join: interval spans more than $maxCellsPerInterval cells of width $bucketWidth: ["),
              col(lo).cast("string"), lit(", "), col(hi).cast("string"), lit(")"))))))
        .drop("__lo_cell", "__hi_cell", "__span")
    }
    onCells(a, aLo, aHi).join(onCells(b, bLo, bHi), keys :+ "__cell")
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__cell") === cell(greatest(col(aLo), col(bLo))))
      .drop("__cell")
  }
}
