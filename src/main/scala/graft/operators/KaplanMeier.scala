package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Kaplan-Meier product-limit fold in scaled-integer arithmetic.
  *
  * Input: the aggregated risk table (t, n_risk, d) — one row per distinct
  * duration unit, n_risk = subjects still at risk entering t, d = events at
  * t. Output adds surv_e12 = ⌊s_{i−1}·(n_i−d_i)/n_i⌋ folded in t-order from
  * s_0 = 10¹².
  *
  * The fold is inherently sequential (each step's floor depends on the
  * previous result — no prefix-sum closed form exists once flooring is in
  * play), so it runs on ONE partition. That is the honest shape: the risk
  * table is O(distinct duration days) — calendar-bounded at ANY corpus
  * scale — while everything corpus-sized (the per-user aggregates that
  * build the table) stays distributed upstream. Each step multiplies
  * through a JVM BigInt, so s·(n−d) cannot wrap however large the cohort.
  */
object KaplanMeier {

  /** `byDay` columns: t (long), n_risk (long, > 0), d (long). */
  def productLimit(byDay: DataFrame): DataFrame = {
    val s = byDay.sparkSession
    import s.implicits._
    byDay.select("t", "n_risk", "d")
      .toDF("_1", "_2", "_3").as[(Long, Long, Long)]
      .repartition(1).sortWithinPartitions($"_1")
      .mapPartitions { it =>
        var acc = BigInt(1000000000000L)
        it.map { case (t, n, d) =>
          acc = acc * (n - d) / n
          (t, n, d, acc.toLong)
        }
      }
      .toDF("t", "n_risk", "d", "surv_e12")
  }
}
