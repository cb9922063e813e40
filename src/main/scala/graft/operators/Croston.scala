package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Croston's method (1972) for INTERMITTENT demand — the forecasting family
  * member Holt/Holt-Winters cannot express: a series that is zero most
  * periods (spare parts, long-tail SKUs) destroys a plain EWMA (it decays
  * toward zero between demands), so Croston smooths TWO series over demand
  * OCCURRENCES only — the nonzero demand sizes z and the inter-demand
  * intervals p — and forecasts the demand RATE z/p per period.
  *
  * Per series key, over the day-ordered demand rows (t strictly increasing,
  * v > 0; zero days are ABSENT — the method never updates on them):
  *   first demand:  z₁ = v₁, p₁ = 1, q₁ = 1
  *   later demands: q_t = t − t_prev  (the realized interval)
  *                  z_t = (v_t + 4·z_{t−1}) quot 5     (α = 1/5)
  *                  p_t = (q_t + 4·p_{t−1}) quot 5
  *   rate_e6 = 10⁶·z quot p   (the per-period demand forecast)
  * All values non-negative, so quot (JVM `/` ≡ Spark IntegralDivide ≡
  * DuckDB `//`) is exact floor on both engines and the fold replays
  * bit-for-bit as a per-series recursive CTE.
  *
  * Execution shape: the HoltLinear secondary-sort pattern — repartition by
  * key, sortWithinPartitions(key, t), ONE mapPartitions with O(1) state;
  * the input is the demand-day aggregate, so the fold length per key is the
  * key's demand count, never the calendar.
  */
object Croston {

  /** `demands` columns: k (string series key), t (long day index, demand
    * days only), v (long demand size). Output adds q (interval), size_z,
    * interval_p, rate_e6.
    */
  def forecast(demands: DataFrame): DataFrame = {
    val s = demands.sparkSession
    import s.implicits._
    demands.select("k", "t", "v")
      .toDF("_1", "_2", "_3").as[(String, Long, Long)]
      .repartition(col("_1")).sortWithinPartitions($"_1", $"_2")
      .mapPartitions { it =>
        var key: String = null
        var z = 0L
        var p = 0L
        var tPrev = 0L
        var first = true
        it.map { case (k, t, v) =>
          if (k != key) { key = k; first = true }
          val q = if (first) 1L else t - tPrev
          if (first) { z = v; p = 1L; first = false }
          else { z = (v + 4L * z) / 5L; p = (q + 4L * p) / 5L }
          tPrev = t
          (k, t, v, q, z, p, 1000000L * z / math.max(p, 1L))
        }
      }
      .toDF("k", "t", "v", "q", "size_z", "interval_p", "rate_e6")
  }
}
