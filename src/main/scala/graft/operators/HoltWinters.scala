package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Holt-Winters ADDITIVE (triple exponential) smoothing — the seasonal
  * capstone of the forecast family ([[HoltLinear]] is level+trend; this
  * adds the period-m seasonal component the repo's daily series actually
  * carry, m = 7 by default):
  *
  *   l_t = ((v_t − s_{t−m}) + 4·(l_{t−1} + b_{t−1})) quot 5    (α = 1/5)
  *   b_t = ((l_t − l_{t−1}) + 9·b_{t−1}) quot 10               (β = 1/10)
  *   s_t = ((v_t − l_t) + 3·s_{t−m}) quot 4                    (γ = 1/4)
  *
  * with l_1 = v_1, b_1 = 0, and MISSING seasonal history reading as 0
  * (s_{t−m} = 0 for t ≤ m — a self-consistent deterministic
  * initialization both engines replay identically; `quot` = truncating
  * division, Spark DIV ≡ DuckDB `//`, the [[HoltLinear]] measurement).
  * One-step forecast = l_t + b_t + s_{t+1−m}.
  *
  * Execution shape: [[HoltLinear]]'s secondary-sort pattern — repartition
  * by series, sortWithinPartitions, one mapPartitions fold whose state is
  * O(period) per key (level, trend, and an m-slot seasonal ring buffer),
  * never a buffered group. The input is the day-aggregated table, so the
  * fold touches O(series × days) rows at any corpus scale.
  */
object HoltWinters {

  /** `daily` columns: k (string series key), t (long, day-ordered within
    * k), v (long). Output adds level, trend, seasonal, forecast1. */
  def smooth(daily: DataFrame, period: Int = 7): DataFrame = {
    require(period >= 2, s"seasonal period must be >= 2, got $period")
    val s = daily.sparkSession
    import s.implicits._
    daily.select("k", "t", "v")
      .toDF("_1", "_2", "_3").as[(String, Long, Long)]
      .repartition(col("_1")).sortWithinPartitions($"_1", $"_2")
      .mapPartitions { it =>
        var key: String = null
        var l = 0L
        var b = 0L
        var ring: Array[Long] = null
        var i = 0
        it.map { case (k, t, v) =>
          if (k != key) {
            key = k; l = 0L; b = 0L; ring = Array.fill(period)(0L); i = 0
          }
          val sOld = ring(i % period) // s_{i−m}; 0 while i < m
          if (i == 0) { l = v; b = 0L }
          else {
            val lPrev = l
            l = ((v - sOld) + 4L * (l + b)) / 5L
            b = ((l - lPrev) + 9L * b) / 10L
          }
          val sNew = ((v - l) + 3L * sOld) / 4L
          ring(i % period) = sNew
          i += 1
          val sNext = ring(i % period) // s_{i+1−m} for the one-step forecast
          (k, t, v, l, b, sNew, l + b + sNext)
        }
      }
      .toDF("k", "t", "v", "level", "trend", "seasonal", "forecast1")
  }
}
