package graft

import graft.streaming.HoltStream
import graft.operators.HoltLinear

/** HoltStream: the online keyed fold is row-identical to the batch
  * HoltLinear operator on real data, and the carried (level, trend) state
  * is load-bearing — resetting it at each micro-batch boundary changes the
  * output.
  */
class HoltStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed smoothing equals the batch fold at sf0.001") {
    val got = SparkEntry.queries("streaming_holt_forecast")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val byDay = core.eventsTable(spark, sf("sf0.001"))
      .groupBy($"event_type".as("k"),
        core.micros(org.apache.spark.sql.functions.date_trunc("day", $"ts")).as("t"))
      .agg(org.apache.spark.sql.functions.sum(
        (core.dec2($"value") * 100).cast("long")).as("v"))
    val want = HoltLinear.smooth(byDay)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == want, "streamed fold must be row-identical to the batch fold")
    assert(got.size > 100, "the corpus must exercise multi-day series")
  }

  test("cross-batch state is load-bearing: a per-batch reset diverges") {
    // replay the 4-slice staging locally with state RESET at each slice:
    // every slice re-initializes level=first v, trend=0 — different rows.
    val rows = SparkEntry.queries("streaming_holt_forecast")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val byKey = rows.groupBy(_._1)
    var divergent = false
    byKey.foreach { case (_, rs) =>
      val n = rs.length
      val sliceAt = Seq(n / 4, n / 2, 3 * n / 4).filter(i => i > 0 && i < n)
      var st: Option[HoltStream.HState] = None
      rs.zipWithIndex.foreach { case (r, i) =>
        if (sliceAt.contains(i)) st = None // boundary reset
        st = Some(HoltStream.step(st, r._3))
        if (st.get.level != r._4 || st.get.trend != r._5) divergent = true
      }
    }
    assert(divergent,
      "per-batch state reset must change the output - otherwise the carried state proves nothing")
  }

  test("step matches the batch recurrence on a declining series") {
    val s1 = HoltStream.step(None, 100L)
    val s2 = HoltStream.step(Some(s1), 41L)
    assert(s1 == HoltStream.HState(100L, 0L))
    assert(s2 == HoltStream.HState(88L, -1L)) // truncation, not floor (see HoltLinearSpec)
  }
}
