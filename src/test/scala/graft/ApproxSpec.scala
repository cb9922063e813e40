package graft

import graft.core._
import org.apache.spark.sql.functions._

/** Error bound for the HLL approximate-distinct sketch: the default rsd is
  * 5%; assert the estimates land within a conservative 3×rsd of the exact
  * distinct counts on the real events table. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 15% of exact on events") {
    val d = sf("sf0.01")
    val (approxU, approxE) = SparkEntry.queries("approx_distinct")(spark, d)
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

  test("per-group HLL sketches and their union are within 5% of exact") {
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

  test("count-min sketch token counts overestimate within eps*N") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("freq_tokens_topk_approx")(spark, d)
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

  test("approx_percentile respects its rank-error bound per group") {
    val d = sf("sf0.01")
    // accuracy=1000 -> rank error eps <= 1/1000; the sketch's answer must lie
    // between the exact quantiles at p +- 2*eps (slack for interpolation).
    val eps = 2.0 / 1000
    val approx = SparkEntry.queries("event_value_quantiles_approx")(spark, d)
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
}
