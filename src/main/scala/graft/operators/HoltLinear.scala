package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Holt linear (double exponential) smoothing as a KEYED sequential
  * integer fold.
  *
  * Per series key, over the day-ordered aggregated values v_t (exact cents):
  *   l_t = (v_t + 4·(l_{t−1} + b_{t−1})) quot 5             (α = 1/5)
  *   b_t = ((l_t − l_{t−1}) + 9·b_{t−1}) quot 10            (β = 1/10)
  * with l_1 = v_1, b_1 = 0 — `quot` = TRUNCATING integer division (JVM `/`),
  * which is what both Spark's IntegralDivide and DuckDB's `//` do on the
  * negative trend values (measured: DuckDB `-11 // 10 = -1`; Math.floorDiv
  * would give −2 and diverge). One truncation per component per step, so
  * the fold replays bit-for-bit as a per-series recursive CTE.
  *
  * Execution shape: the secondary-sort pattern — repartition by series key,
  * sortWithinPartitions(key, t), one mapPartitions holding O(1) state (the
  * current key's level/trend), never a buffered group. The input is the
  * day-AGGREGATED table, O(series × days), so even the per-partition scan is
  * calendar-bounded; the corpus-sized work happened in the upstream
  * aggregation. No closed form exists once per-step flooring is in play
  * (same argument as KaplanMeier).
  *
  * Magnitude: pure Long arithmetic — 4·(l+b) wraps only past ~2.3e18 cents
  * per (series, day), far above any daily aggregate at 100 TB.
  */
object HoltLinear {

  /** `daily` columns: k (string series key), t (long, day-ordered within k),
    * v (long). Output: k, t, v, level, trend, forecast1 = level + trend.
    */
  def smooth(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    daily.select("k", "t", "v")
      .toDF("_1", "_2", "_3").as[(String, Long, Long)]
      .repartition(col("_1")).sortWithinPartitions($"_1", $"_2")
      .mapPartitions { it =>
        var key: String = null
        var l = 0L
        var b = 0L
        var first = true
        it.map { case (k, t, v) =>
          if (k != key) { key = k; first = true }
          if (first) { l = v; b = 0L; first = false }
          else {
            val lPrev = l
            l = (v + 4L * (l + b)) / 5L
            b = ((l - lPrev) + 9L * b) / 10L
          }
          (k, t, v, l, b, l + b)
        }
      }
      .toDF("k", "t", "v", "level", "trend", "forecast1")
  }
}
