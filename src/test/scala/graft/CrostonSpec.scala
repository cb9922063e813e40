package graft

import graft.operators.Croston
import org.apache.spark.sql.functions.col

/** Croston.forecast: the keyed secondary-sort fold equals a per-series
  * sequential replay under any input order/partitioning, resets state at
  * key boundaries, and degenerates to a plain size-EWMA on regular
  * (every-period) demand.
  */
class CrostonSpec extends SparkSpec {
  import spark.implicits._

  private def replay(rows: Seq[(String, Long, Long)])
      : Set[(String, Long, Long, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      var z = 0L; var p = 0L; var tPrev = 0L; var first = true
      rs.sortBy(_._2).map { case (_, t, v) =>
        val q = if (first) 1L else t - tPrev
        if (first) { z = v; p = 1L; first = false }
        else { z = (v + 4L * z) / 5L; p = (q + 4L * p) / 5L }
        tPrev = t
        (k, t, v, q, z, p, 1000000L * z / math.max(p, 1L))
      }
    }.toSet

  test("multi-series fold equals the sequential replay under shuffled input") {
    val rnd = new scala.util.Random(31)
    val rows = for {
      k <- Seq("a", "b", "c")
      t <- 0L until 200L if rnd.nextInt(7) == 0 // intermittent: ~1 in 7 days
    } yield (k, t, 1L + rnd.nextLong(500L))
    val shuffled = rnd.shuffle(rows)
    val got = Croston.forecast(shuffled.toDF("k", "t", "v").repartition(5))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == replay(rows))
  }

  test("state resets at key boundaries (no interval bleed between series)") {
    // series "a" ends at t=1000; series "b" starts at t=2: a cross-key
    // interval would be huge, a correct reset gives q=1
    val rows = Seq(("a", 1000L, 50L), ("b", 2L, 9L), ("b", 5L, 9L))
    val got = Croston.forecast(rows.toDF("k", "t", "v"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got(1) == (("b", 2L, 9L, 1L, 9L, 1L, 9000000L)))
    assert(got(2)._4 == 3L) // q = 5 - 2, not 5 - 1000
  }

  test("regular every-period demand degenerates to the size EWMA (p stays 1)") {
    val rows = (0L until 30L).map(t => ("r", t, 100L + (t % 3)))
    val got = Croston.forecast(rows.toDF("k", "t", "v"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.forall(_._6 == 1L))           // interval_p pinned at 1
    assert(got.forall(r => r._7 == r._5 * 1000000L)) // rate = size
  }

  test("streamed forecast equals the batch fold at sf0.001") {
    import org.apache.spark.sql.functions.{col, lit, sum}
    val got = SparkEntry.queries("streaming_croston_forecast")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val day = 86400000000L
    val demands = core.table(spark, sf("sf0.001"), "lineitem")
      .groupBy(col("l_partkey"),
        core.idiv(core.micros(col("l_shipdate")), lit(day)).as("t"))
      .agg(sum(col("l_quantity").cast("long")).as("v"))
      .select(col("l_partkey").cast("string").as("k"), col("t"), col("v"))
    val want = Croston.forecast(demands)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == want, "streamed fold must be row-identical to the batch fold")
    assert(got.size > 1000, "the corpus must exercise many intermittent series")
  }

  test("cross-batch state is load-bearing: a per-batch reset diverges") {
    import graft.streaming.CrostonStream
    val rows = SparkEntry.queries("streaming_croston_forecast")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    var divergent = false
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val n = rs.length
      val sliceAt = Seq(n / 4, n / 2, 3 * n / 4).filter(i => i > 0 && i < n)
      var st: Option[CrostonStream.CState] = None
      rs.zipWithIndex.foreach { case (r, i) =>
        if (sliceAt.contains(i)) st = None // boundary reset
        st = Some(CrostonStream.step(st, r._2, r._3)._1)
        if (st.get.z != r._5 || st.get.p != r._6) divergent = true
      }
    }
    assert(divergent,
      "per-batch state reset must change the output - otherwise carried state proves nothing")
  }
}
