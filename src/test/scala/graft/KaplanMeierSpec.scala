package graft

import graft.operators.KaplanMeier

/** KaplanMeier.productLimit: the sequential scaled-integer fold equals a
  * local BigInt replay regardless of input partitioning/order, floors each
  * step (never rounds), and survives cohort sizes whose step product would
  * wrap a 64-bit long.
  */
class KaplanMeierSpec extends SparkSpec {
  import spark.implicits._

  private def replay(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    var acc = BigInt(1000000000000L)
    rows.sortBy(_._1).map { case (t, n, d) =>
      acc = acc * (n - d) / n
      (t, n, d, acc.toLong)
    }
  }

  test("fold equals the local replay on a real-shaped risk table") {
    // 100 subjects, events and censorings spread over 12 days
    var atRisk = 100L
    val rows = (0L until 12L).map { t =>
      val d = (t * 3 + 1) % 5
      val c = (t * 7 + 2) % 4
      val r = (t, atRisk, d)
      atRisk -= (d + c)
      r
    }.filter(_._2 > 0)
    val got = KaplanMeier.productLimit(
        rows.toDF("t", "n_risk", "d").repartition(7))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == replay(rows), "fold must equal the sequential BigInt replay")
    assert(got.map(_._4) == got.map(_._4).sorted.reverse, "survival is monotone non-increasing")
  }

  test("input order and partitioning cannot change the result") {
    val rows = Seq((3L, 40L, 5L), (1L, 100L, 10L), (2L, 70L, 7L), (0L, 120L, 3L))
    val a = KaplanMeier.productLimit(rows.toDF("t", "n_risk", "d"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = KaplanMeier.productLimit(
        rows.reverse.toDF("t", "n_risk", "d").repartition(5))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a == replay(rows).toSet)
  }

  test("each step floors (a float product would round up here)") {
    // single step: 1e12 * 2 / 3 = 666666666666.67 -> floor 666666666666
    val got = KaplanMeier.productLimit(Seq((0L, 3L, 1L)).toDF("t", "n_risk", "d"))
      .as[(Long, Long, Long, Long)].head()
    assert(got._4 == 666666666666L)
  }

  test("cohort sizes past the long-product range do not wrap") {
    // s * (n - d) ~ 1e12 * 2e10 = 2e22 >> Long.MaxValue: BigInt keeps it exact
    val n = 20_000_000_000L
    val got = KaplanMeier.productLimit(Seq((0L, n, 1L)).toDF("t", "n_risk", "d"))
      .as[(Long, Long, Long, Long)].head()
    assert(got._4 == (BigInt(1000000000000L) * (n - 1) / n).toLong)
  }

  test("an all-events day zeroes survival and it stays zero") {
    val got = KaplanMeier.productLimit(
        Seq((0L, 10L, 10L), (1L, 5L, 1L)).toDF("t", "n_risk", "d"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._4).toSeq == Seq(0L, 0L))
  }
}
