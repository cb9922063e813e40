package graft

import graft.operators.SpatialJoin

/** [[SpatialJoin.withinDistance]] vs the O(N²) brute force: randomized
  * point sets (including same-cell, adjacent-cell, diagonal-cell, and
  * exact-boundary pairs) — the grid candidates must be lossless, the
  * verify exact, and every pair reported exactly once.
  */
class SpatialJoinSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Long, Long)], r2: Long): Set[(Long, Long, Long)] =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r2
    } yield (ia, ib, d2)).toSet

  private def run(pts: Seq[(Long, Long, Long)], r2: Long, cell: Long): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    SpatialJoin.withinDistance(pts.toDF("id", "x", "y"), r2, cell)
      .as[(Long, Long, Long)].collect().toSeq
  }

  test("deterministic structure: same cell, adjacent cells, diagonal, boundary") {
    val r2 = 100L // r = 10, cell = 10
    val pts = Seq(
      (1L, 5L, 5L), (2L, 7L, 7L),      // same cell, d2 = 8
      (3L, 9L, 5L), (4L, 11L, 5L),     // adjacent cells, d2 = 4
      (5L, 9L, 9L), (6L, 11L, 11L),    // diagonal cells, d2 = 8
      (7L, 50L, 50L), (8L, 60L, 50L),  // exact boundary: d2 = 100 = r2
      (9L, 200L, 200L))                // isolated
    val got = run(pts, r2, 10L)
    assert(got.toSet == brute(pts, r2))
    assert(got.size == got.toSet.size, "a pair was emitted more than once")
    assert(got.toSet.contains((7L, 8L, 100L)), "inclusive boundary must match")
  }

  test("randomized point clouds match brute force, pairs exactly once") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val pts = (1L to 120L).map(i =>
        (i, rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      val r2 = 400L // r = 20
      val got = run(pts, r2, 20L)
      assert(got.size == got.toSet.size, s"trial $trial: duplicate pair")
      assert(got.toSet == brute(pts, r2), s"trial $trial mismatch")
      // an oversized cell is also correct (everything in fewer cells)
      assert(run(pts, r2, 75L).toSet == brute(pts, r2), s"trial $trial big-cell")
    }
  }

  test("cell smaller than the radius is rejected loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      SpatialJoin.withinDistance(Seq((1L, 0L, 0L)).toDF("id", "x", "y"),
        r2 = 10000L, cell = 50L)
    }
  }
}
