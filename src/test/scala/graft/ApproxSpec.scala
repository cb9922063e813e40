package graft

import graft.core._
import graft.queries.Relational
import org.apache.spark.sql.functions._

/** The approximate-sketch family, BOTH paths of each row (r14):
  *  - the NATIVE production sketches (Spark HLL++ / DataSketches HLL /
  *    CountMinSketch / GK approx_percentile) held to error bounds against
  *    exact answers — `Relational.*Native`;
  *  - the REPLAYABLE twins that are now the registered, oracle-checked rows
  *    (x^17-mod-Mersenne HLL registers, Carter-Wegman CMS, deterministic
  *    LCG-sample rank quantiles) held to the SAME kind of bounds — the
  *    oracle proves cross-engine identity, these tests prove the twins
  *    still measure the truth.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("native approx_count_distinct is within 15% of exact on events") {
    val d = sf("sf0.01")
    val (approxU, approxE) = Relational.approxDistinctNative(spark, d)
      .as[(Long, Long)].head()
    val exact = eventsTable(spark, d)
      .agg(countDistinct($"user_id"), countDistinct($"event_id"))
      .as[(Long, Long)].head()
    def relErr(a: Long, e: Long): Double = math.abs(a - e).toDouble / e
    assert(relErr(approxU, exact._1) < 0.15,
      s"users: approx $approxU vs exact ${exact._1}")
    assert(relErr(approxE, exact._2) < 0.15,
      s"events: approx $approxE vs exact ${exact._2}")
  }

  test("replayable HLL twin is within 15% of exact on events (m=256, sigma~6.5%)") {
    val d = sf("sf0.01")
    val (approxU, approxE) = SparkEntry.queries("approx_distinct")(spark, d)
      .as[(Long, Long)].head()
    val exact = eventsTable(spark, d)
      .agg(countDistinct($"user_id"), countDistinct($"event_id"))
      .as[(Long, Long)].head()
    def relErr(a: Long, e: Long): Double = math.abs(a - e).toDouble / e
    assert(relErr(approxU, exact._1) < 0.15,
      s"users: twin $approxU vs exact ${exact._1}")
    assert(relErr(approxE, exact._2) < 0.15,
      s"events: twin $approxE vs exact ${exact._2}")
  }

  test("native per-group HLL sketches and their union are within 5% of exact") {
    val d = sf("sf0.01")
    val got = Relational.approxDistinctByGroupNative(spark, d)
      .as[(String, Long)].collect().toMap
    val exactPer = eventsTable(spark, d)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = eventsTable(spark, d)
      .agg(countDistinct($"user_id")).as[Long].head()
    def relErr(a: Long, e: Long): Double = math.abs(a - e).toDouble / e
    exactPer.foreach { case (t, e) =>
      assert(relErr(got(t), e) < 0.05, s"$t: approx ${got(t)} vs exact $e")
    }
    // the union row measures DISTINCT users across types, not the sum of the
    // per-type figures (users overlap types) — sketch merge must reflect that
    assert(relErr(got("ALL"), exactAll) < 0.05,
      s"union: approx ${got("ALL")} vs exact $exactAll")
    assert(got("ALL") < exactPer.values.sum,
      "union must deduplicate users that appear under several event types")
    assert(got("ALL") >= exactPer.keys.map(got).max,
      "union can never undercut its largest input sketch")
  }

  test("replayable per-group HLL twin: within 15% of exact, union is a true sketch merge") {
    val d = sf("sf0.01")
    val got = SparkEntry.queries("approx_distinct_by_group")(spark, d)
      .as[(String, Long)].collect().toMap
    val exactPer = eventsTable(spark, d)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = eventsTable(spark, d)
      .agg(countDistinct($"user_id")).as[Long].head()
    def relErr(a: Long, e: Long): Double = math.abs(a - e).toDouble / e
    exactPer.foreach { case (t, e) =>
      assert(relErr(got(t), e) < 0.15, s"$t: twin ${got(t)} vs exact $e")
    }
    assert(relErr(got("ALL"), exactAll) < 0.15,
      s"union: twin ${got("ALL")} vs exact $exactAll")
    assert(got("ALL") < exactPer.values.sum,
      "union must deduplicate users that appear under several event types")
    assert(got("ALL") >= exactPer.keys.map(got).max,
      "union can never undercut its largest input sketch")
  }

  test("native count-min sketch token counts overestimate within eps*N") {
    val d = sf("sf0.01")
    val rows = Relational.freqTokensTopkNative(spark, d)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 50) // synthetic corpus has ~31 distinct tokens
    val totalTokens = graft.core.table(spark, d, "documents")
      .select(explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))))
      .count()
    val maxErr = (0.0001 * totalTokens).ceil.toLong max 1L
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS underestimated '$tok': $est < $exact (impossible)")
      assert(est <= exact + maxErr, s"CMS error on '$tok': $est vs $exact (+$maxErr allowed)")
    }
  }

  test("replayable CMS twin: overestimate-only within the 4x8192 table's bound") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("freq_tokens_topk_approx")(spark, d)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val totalTokens = graft.core.table(spark, d, "documents")
      .select(explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))))
      .count()
    // CMS guarantee for w=8192, depth 4: excess ≤ 2N/w per row w.h.p., min
    // over 4 rows far tighter; allow the loose per-row bound
    val maxErr = (2.0 * totalTokens / 8192).ceil.toLong max 1L
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS twin underestimated '$tok': $est < $exact (impossible)")
      assert(est <= exact + maxErr, s"CMS twin error on '$tok': $est vs $exact (+$maxErr allowed)")
    }
  }

  test("native approx_percentile respects its rank-error bound per group") {
    val d = sf("sf0.01")
    // accuracy=1000 -> rank error eps <= 1/1000; the sketch's answer must lie
    // between the exact quantiles at p +- 2*eps (slack for interpolation).
    val eps = 2.0 / 1000
    val approx = Relational.eventQuantilesGkNative(spark, d)
      .as[(String, Double, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = eventsTable(spark, d)
      .groupBy($"event_type")
      .agg(
        expr(s"percentile(value, ${0.5 - eps})").as("p50_lo"),
        expr(s"percentile(value, ${0.5 + eps})").as("p50_hi"),
        expr(s"percentile(value, ${0.95 - eps})").as("p95_lo"),
        expr(s"percentile(value, ${0.95 + eps})").as("p95_hi"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (et, p50lo, p50hi, p95lo, p95hi) =>
      val (p50, p95) = approx(et)
      assert(p50 >= p50lo && p50 <= p50hi, s"$et p50=$p50 outside [$p50lo,$p50hi]")
      assert(p95 >= p95lo && p95 <= p95hi, s"$et p95=$p95 outside [$p95lo,$p95hi]")
    }
  }

  test("replayable sample-quantile twin respects the order-statistic rank bound") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("event_value_quantiles_approx")(spark, d)
      .as[(String, Double, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, p50, p95, n, sampleN) =>
      assert(sampleN > 0 && sampleN <= n)
      // deterministic 1/64 sample: expect n/64 ± a wide margin
      assert(math.abs(sampleN - n / 64.0) <= math.max(8.0, 0.5 * n / 64.0),
        s"$et: sample_n $sampleN implausible for n $n")
      // 4-sigma order-statistic envelope: the sample q-quantile's true rank
      // is within q ± 4*sqrt(q(1-q)/ns), so the VALUE must lie between the
      // exact quantiles at those ranks
      def bound(q: Double): (Double, Double) = {
        val dev = 4.0 * math.sqrt(q * (1 - q) / sampleN)
        (math.max(0.0, q - dev), math.min(1.0, q + dev))
      }
      val (l50, h50) = bound(0.5); val (l95, h95) = bound(0.95)
      val Seq(e50l, e50h, e95l, e95h) = eventsTable(spark, d)
        .filter($"event_type" === et)
        .agg(expr(s"percentile(value, $l50)"), expr(s"percentile(value, $h50)"),
          expr(s"percentile(value, $l95)"), expr(s"percentile(value, $h95)"))
        .head().toSeq.map(_.asInstanceOf[Double])
      assert(p50 >= e50l && p50 <= e50h, s"$et p50=$p50 outside [$e50l,$e50h]")
      assert(p95 >= e95l && p95 <= e95h, s"$et p95=$p95 outside [$e95l,$e95h]")
    }
  }
}
