package graft

import org.apache.spark.sql.functions._

/** Semantics the Analytics queries lean on cross-engine. The survivorship
  * merge assumes `max_by(col, when(col.isNotNull, ord))` skips rows whose
  * order is NULL (mirroring DuckDB's `arg_max ... FILTER`): that assumption
  * is load-bearing for golden_record correctness, so it is pinned here on a
  * corpus where every interesting case — different columns winning from
  * different rows, an all-NULL column, a NULL in the latest row — occurs.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("max_by with NULLed order ignores unobserved rows (survivorship kernel)") {
    // key 1: latest row (ord 3) has NULL a, so a must come from ord 2 while
    //        b comes from ord 3 — different columns, different winners.
    // key 2: a is never observed -> NULL; b observed once.
    val df = Seq(
      (1L, 1L, Some("a1"), Some("b1")),
      (1L, 2L, Some("a2"), None),
      (1L, 3L, None, Some("b3")),
      (2L, 1L, None, Some("b9"))
    ).toDF("k", "ord", "a", "b")
    val got = df.groupBy($"k").agg(
        max_by($"a", when($"a".isNotNull, $"ord")).as("last_a"),
        max_by($"b", when($"b".isNotNull, $"ord")).as("last_b"))
      .orderBy($"k").as[(Long, Option[String], Option[String])].collect()
    assert(got.toSeq == Seq(
      (1L, Some("a2"), Some("b3")),
      (2L, None, Some("b9"))))
  }

  test("golden_record: per-column winners differ from the overall latest row") {
    val rows = SparkEntry.queries("golden_record")(spark, sf("sf0.001"))
    // the deterministic NULLing (status unreported when F, priority when
    // urgent) must actually produce customers whose last_status and
    // last_priority come from rows OLDER than last_seen_ord — i.e. the
    // filtered recency is doing real work, not collapsing to plain max_by
    val plain = core.table(spark, sf("sf0.001"), "orders").groupBy($"o_custkey")
      .agg(max_by($"o_orderstatus",
        unix_date($"o_orderdate".cast("date")).cast("long") * 10000000000L + $"o_orderkey")
        .as("naive_status"))
    val joined = rows.join(plain, "o_custkey")
    val differing = joined.filter($"last_status" =!= $"naive_status").count()
    assert(differing > 0,
      "NULLing never changed a winner - the survivorship path is untested by this data")
  }
}
