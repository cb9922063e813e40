package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of semantics corner cases: the struct-carried payload must preserve a
  * legitimately-NULL payload field of the MATCHING right row (not fall back
  * to an older right row's non-null value), ties are inclusive, and
  * colliding column names are rejected up front.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("a NULL payload field in the matching right row stays NULL") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, Some(100.0)),  // older row: non-null value
      (1L, 15L, None: Option[Double])) // matching row for t=20: NULL value
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(out("e1").contains(100.0)) // t=10 matches rt=5
    assert(out("e2").isEmpty, // t=20 matches rt=15 whose v IS NULL — must stay NULL
      s"NULL payload fell back to an older right row: ${out("e2")}")
  }

  test("left rows before any right row get NULL payloads; ties are inclusive") {
    val left = Seq((1L, 1L, "early"), (1L, 5L, "tie")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 7.5)).toDF("rk", "rt", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(out("early").isEmpty)
    assert(out("tie").contains(7.5)) // rt == t matches (inclusive)
  }

  test("colliding left/payload column names are rejected") {
    val left = Seq((1L, 1L, 2.0)).toDF("k", "t", "v") // 'v' collides with payload
    val right = Seq((1L, 1L, 3.0)).toDF("rk", "rt", "v")
    intercept[IllegalArgumentException](
      AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v")))
  }
}
