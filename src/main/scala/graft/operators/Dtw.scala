package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic Time Warping distance between integer time series — the
  * alignment-tolerant series similarity Euclidean distance cannot express
  * (two series with the same shape shifted by a month are "far" in L2 but
  * near in DTW). Classic O(L²) dynamic program per pair with |a_i − b_j|
  * costs and the (↑, ←, ↖) recurrence; all-integer, so the whole matrix
  * replays exactly (the DuckDB twin carries the DP row as a LIST column
  * through a recursive CTE and rebuilds each row with a left-to-right
  * list_reduce — the same cell order as the imperative loop).
  *
  * Scale shape: the DP is per-PAIR imperative state (two O(L) rows) — the
  * textbook mapPartitions case, like the HoltLinear fold. Work is
  * O(pairs·L²) and embarrassingly parallel over pairs; L is bounded by the
  * calendar (monthly series: L ≈ 8/decade·12), NOT the corpus, so 100 TB
  * changes the upstream aggregate only. For long series the standard
  * Sakoe-Chiba band (cap |i−j| ≤ w) drops a pair to O(L·w); at L ≈ 100 the
  * full matrix is already ~10⁴ cells and banding would only change the
  * VALUE (band-constrained DTW), so the exact form is kept.
  */
object Dtw {

  /** Exact full-matrix DTW cost. */
  def dtw(a: Array[Long], b: Array[Long]): Long = {
    require(a.nonEmpty && b.nonEmpty, "DTW over an empty series")
    val n = b.length
    var prev = new Array[Long](n)
    var cur = new Array[Long](n)
    prev(0) = math.abs(a(0) - b(0))
    var j = 1
    while (j < n) { prev(j) = prev(j - 1) + math.abs(a(0) - b(j)); j += 1 }
    var i = 1
    while (i < a.length) {
      cur(0) = prev(0) + math.abs(a(i) - b(0))
      j = 1
      while (j < n) {
        val m = math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        cur(j) = math.abs(a(i) - b(j)) + m
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n - 1)
  }

  /** All-pairs DTW over `series` (id: long, vs: array<long>): one row per
    * unordered pair id_a < id_b with the exact integer cost. The pair frame
    * is O(k²) for k series — tiny relative to the corpus that built the
    * arrays — and each pair's DP runs independently inside mapPartitions.
    */
  def pairDistances(series: DataFrame): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val a = series.select(col("id").as("id_a"), col("vs").as("va"))
    val b = series.select(col("id").as("id_b"), col("vs").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"))
      .as[(Long, Long, Seq[Long], Seq[Long])]
      .mapPartitions(_.map { case (ia, ib, va, vb) =>
        (ia, ib, dtw(va.toArray, vb.toArray))
      })
      .toDF("id_a", "id_b", "dtw_cost")
      .orderBy("id_a", "id_b")
  }
}
