package graft

import org.apache.spark.sql.functions._

/** Money-conservation property of the position-based attribution split:
  * whatever the touch-path length, the per-purchase credits sum EXACTLY to
  * the purchase's revenue (the final touch absorbs the floor remainder),
  * and the per-position weights follow the documented 40/20/40 U-shape.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // the registered query's credit pipeline, isolated on a synthetic path
  private def credits(revC: Long, nTouches: Int): Seq[Long] = {
    val touches = (1 to nTouches).map(i =>
      (1L, revC, i.toLong, 1000L + i)) // (p_id, rev_c, pos-order ts, click_id)
      .toDF("p_id", "rev_c", "ctsu", "click_id")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_id").orderBy($"ctsu", $"click_id")
    val withPos = touches
      .withColumn("pos", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"p_id")))
    val bp = when($"n" === 1, lit(10000L))
      .when($"n" === 2, lit(5000L))
      .when($"pos" === 1 || $"pos" === $"n", lit(4000L))
      .otherwise(graft.core.idiv(lit(2000L), $"n" - 2))
    val withFloor = withPos.withColumn("floor_c", graft.core.idiv($"rev_c" * bp, lit(10000L)))
    val wSum = org.apache.spark.sql.expressions.Window.partitionBy($"p_id")
    withFloor
      .withColumn("others_c", sum(when($"pos" === $"n", 0L).otherwise($"floor_c")).over(wSum))
      .withColumn("credit_c",
        when($"pos" === $"n", $"rev_c" - $"others_c").otherwise($"floor_c"))
      .orderBy($"pos").select($"credit_c").as[Long].collect().toSeq
  }

  test("per-purchase credits sum exactly to revenue for every path length") {
    for (n <- 1 to 9; revC <- Seq(1L, 99L, 10001L, 9999999L)) {
      val cs = credits(revC, n)
      assert(cs.length == n)
      assert(cs.sum == revC, s"n=$n rev=$revC credits=$cs lose cents")
      assert(cs.forall(_ >= 0), s"n=$n rev=$revC negative credit: $cs")
    }
  }

  test("the split is the documented U-shape") {
    assert(credits(10000L, 1) == Seq(10000L))
    assert(credits(10000L, 2) == Seq(5000L, 5000L))
    // n=4: first/last 4000, two middles floor(2000/2)=1000 each; final
    // touch absorbs the zero remainder
    assert(credits(10000L, 4) == Seq(4000L, 1000L, 1000L, 4000L))
    // n=5: middles floor(2000/3)=666 bp -> 666 each on 10000 cents; final
    // touch takes 10000 - (4000+666+666+666) = 4002 (the remainder)
    assert(credits(10000L, 5) == Seq(4000L, 666L, 666L, 666L, 4002L))
  }
}
