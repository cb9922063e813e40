package graft

import org.apache.spark.sql.functions._

/** LateDimJoin proofs beyond the DuckDB oracle: the streamed result is the
  * exact batch inner join (engine-internal check), the buffered/immediate
  * split matches the staging rule — i.e. the state machine really buffered
  * the racing facts instead of dropping or null-padding them — and both
  * paths are exercised by the data.
  */
class LateDimJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val got =
    SparkEntry.queries("streaming_late_dim_backfill")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, String, Boolean)].collect()

  test("streamed backfill join equals the batch inner join") {
    val ev = core.eventsTable(spark, sf("sf0.001"))
      .select($"event_id", $"user_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val want = ev.map { case (id, u, vc) => (id, u, vc, s"S${u % 5}") }.sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq == want.toSeq,
      "backfill output differs from the batch join")
  }

  test("was_buffered follows the staging race exactly, and both paths fire") {
    got.foreach { case (id, u, _, _, buffered) =>
      val expect = id % 2 == 0 || u % 2 == 1
      assert(buffered == expect, s"event $id user $u: buffered=$buffered")
    }
    assert(got.exists(_._5) && got.exists(!_._5),
      "staging must exercise both the buffered and the immediate path")
  }
}
