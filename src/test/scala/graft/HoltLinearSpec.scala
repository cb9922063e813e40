package graft

import graft.operators.HoltLinear

/** HoltLinear.smooth: the keyed secondary-sort fold equals a per-series
  * sequential replay under any input order/partitioning, resets state at
  * key boundaries, and TRUNCATES on negative trends — the measured DuckDB
  * `//` semantic (-11 // 10 = -1) the oracle replays.
  */
class HoltLinearSpec extends SparkSpec {
  import spark.implicits._

  private def replay(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      var l = 0L; var b = 0L; var first = true
      rs.sortBy(_._2).map { case (_, t, v) =>
        if (first) { l = v; b = 0L; first = false }
        else {
          val lp = l
          l = (v + 4L * (l + b)) / 5L
          b = ((l - lp) + 9L * b) / 10L
        }
        (k, t, v, l, b, l + b)
      }
    }.toSet

  test("multi-series fold equals the sequential replay under shuffled input") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      k <- Seq("a", "b", "c")
      t <- 0L until 40L
    } yield (k, t, rnd.nextLong(2000000L) - 500000L)
    val shuffled = rnd.shuffle(rows)
    val got = HoltLinear.smooth(shuffled.toDF("k", "t", "v").repartition(7))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == replay(rows))
  }

  test("state resets at key boundaries (no bleed between adjacent series)") {
    // series "a" ends on a huge level; series "b" must start fresh at v_1
    val rows = Seq(("a", 0L, 1000000L), ("a", 1L, 1000000L), ("b", 0L, 3L))
    val got = HoltLinear.smooth(rows.toDF("k", "t", "v"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .find(r => r._1 == "b").get
    assert(got._4 == 3L && got._5 == 0L, "series b must initialize from its own head")
  }

  test("declining series produces negative trend, truncated like DuckDB //") {
    // A declining step whose trend quotient is negative and non-exact:
    // truncation (-19/10 = -1) differs from floor (-2) — the fold must
    // TRUNCATE to replay DuckDB's measured `//`.
    val rows = Seq(("a", 0L, 100L), ("a", 1L, 41L))
    val got = HoltLinear.smooth(rows.toDF("k", "t", "v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    // l2 = (41 + 400) quot 5 = 88 ; b2 = (-12 + 0) quot 10 = -1 (floor: -2)
    assert(got(1)._4 == 88L && got(1)._5 == -1L)
    assert(Math.floorDiv(-12L, 10L) == -2L,
      "the case genuinely separates truncation from floor")
  }
}
