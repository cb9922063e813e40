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

  test("property: leftAsOf equals a per-key sequential reference on random series") {
    import org.scalacheck.{Gen => G}
    import org.scalacheck.rng.Seed
    // random (key, time) rows with deliberate time collisions (small domains)
    val leftGen = G.zip(G.chooseNum(0L, 5L), G.chooseNum(0L, 30L))
    val rightGen = G.zip(G.chooseNum(0L, 5L), G.chooseNum(0L, 30L), G.chooseNum(100L, 999L))
    for (round <- 1 to 3) {
      val lRows = G.listOfN(60, leftGen).pureApply(G.Parameters.default, Seed(round * 7L))
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rRaw = G.listOfN(25, rightGen).pureApply(G.Parameters.default, Seed(round * 13L))
      // contract: right unique per (key, time) - keep max payload per slot
      val rRows = rRaw.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val left = lRows.toDF("row_id", "k", "t")
      val right = rRows.toDF("rk", "rt", "payload")
      val got = graft.operators.AsOfJoin
        .leftAsOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
        .select($"row_id", $"payload").as[(Long, Option[Long])].collect().toMap
      for ((id, k, t) <- lRows) {
        val want = rRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(id) == want, s"round=$round key=$k t=$t")
      }
    }
  }

  test("property: random series with NULL payload fields inside matching right rows") {
    import org.scalacheck.{Gen => G}
    import org.scalacheck.rng.Seed
    // Like the property above, but ~1/3 of right payload values are NULL —
    // the struct-carry must return the MATCHING row's NULL, never fall back
    // to an older non-null row. A second always-non-null payload column
    // (`marker`) disambiguates "matched a NULL-payload row" from "no match".
    val leftGen = G.zip(G.chooseNum(0L, 5L), G.chooseNum(0L, 30L))
    val rightGen = G.zip(G.chooseNum(0L, 5L), G.chooseNum(0L, 30L),
      G.option(G.chooseNum(100L, 999L)).map(o => o.filter(_ % 3 != 0)))
    for (round <- 1 to 3) {
      val lRows = G.listOfN(60, leftGen).pureApply(G.Parameters.default, Seed(round * 19L))
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rRaw = G.listOfN(30, rightGen).pureApply(G.Parameters.default, Seed(round * 23L))
      // contract: right unique per (key, time); marker = encoded (key, time)
      val rRows = rRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .map { case (k, t, v) => (k, t, v, k * 1000 + t) }
      val left = lRows.toDF("row_id", "k", "t")
      val right = rRows.toDF("rk", "rt", "payload", "marker")
      val got = graft.operators.AsOfJoin
        .leftAsOf(left, right, "k", "rk", "t", "rt", Seq("payload", "marker"))
        .select($"row_id", $"payload", $"marker")
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      for ((id, k, t) <- lRows) {
        val matched = rRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        val want = (matched.flatMap(_._3), matched.map(_._4))
        assert(got(id) == want,
          s"round=$round key=$k t=$t: got ${got(id)}, want $want (matched row $matched)")
      }
    }
  }

  test("colliding left/payload column names are rejected") {
    val left = Seq((1L, 1L, 2.0)).toDF("k", "t", "v") // 'v' collides with payload
    val right = Seq((1L, 1L, 3.0)).toDF("rk", "rt", "v")
    intercept[IllegalArgumentException](
      AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("v")))
  }
}
