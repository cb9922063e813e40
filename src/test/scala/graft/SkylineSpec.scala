package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Skyline.frontier2D must equal the brute-force NOT-EXISTS dominance
  * semantics on arbitrary data (incl. duplicate points and ties on one
  * axis), independently of the input partitioning, without ever running an
  * unpartitioned window or an O(N²) join.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force dominance filter: keep (x, y) iff no other point has
    * x' <= x && y' >= y with at least one strict. */
  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.toSet

  private def viaOp(pts: Seq[(Long, Long, Long)], parts: Int): Set[(Long, Long, Long)] =
    Skyline.frontier2D(
        pts.toDF("id", "x", "y").repartition(parts), x = "x", y = "y")
      .as[(Long, Long, Long)].collect().toSet

  test("equals brute-force dominance on random points, any partitioning") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val pts = (0L until 300L).map(i =>
        (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val expect = brute(pts)
      assert(viaOp(pts, 1) == expect, s"trial $trial, 1 partition")
      assert(viaOp(pts, 13) == expect, s"trial $trial, 13 partitions")
    }
  }

  test("duplicate frontier points all survive; dominated ties die") {
    // (1,10) twice: mutually non-dominating, both stay. (1,9) is dominated
    // by (1,10) (same x, strictly larger y). (2,10) is dominated by (1,10).
    // (0,5) survives (cheapest). (2,11) survives (best y).
    val pts = Seq((1L, 1L, 10L), (2L, 1L, 10L), (3L, 1L, 9L),
      (4L, 2L, 10L), (5L, 0L, 5L), (6L, 2L, 11L))
    assert(viaOp(pts, 4) == Set((1L, 1L, 10L), (2L, 1L, 10L), (5L, 0L, 5L), (6L, 2L, 11L)))
  }

  test("null coordinates are excluded, not propagated") {
    val df = Seq((1L, Some(1L), Some(10L)), (2L, None, Some(99L)), (3L, Some(0L), None))
      .toDF("id", "x", "y")
    val out = Skyline.frontier2D(df, "x", "y").select($"id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("plan has no unpartitioned window and no cartesian product") {
    val p = core.table(spark, sf("sf0.001"), "part").select($"p_partkey",
      $"p_size".cast("long").as("size"),
      round($"p_retailprice" * 100).cast("long").as("price_c"))
    val out = Skyline.frontier2D(p, "price_c", "size")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert(out.count() > 0)
  }
}
