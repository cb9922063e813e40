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
}
