package graft

import graft.operators.Bfs

/** Time-respecting reachability semantics — the cases that separate it from
  * structural BFS: a structurally-present path whose timestamps decrease is
  * NOT traversable, strictness at equal times, parallel edges re-opening
  * paths, earliest-arrival minimality, and reliable-checkpoint equality.
  */
class TemporalReachabilitySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      hops: Int, dir: Option[String] = None): Map[Long, Long] =
    Bfs.temporalReachability(edges.toDF("src", "dst", "t"),
        seeds.toDF("node"), hops, dir)
      .as[(Long, Long)].collect().toMap

  test("decreasing timestamps block a structurally-present path") {
    // A(1)→B at t=10, B→C at t=5: BFS reaches C, temporal does not
    val e = Seq((1L, 2L, 10L), (2L, 3L, 5L))
    val got = run(e, Seq(1L), hops = 3)
    assert(got == Map(1L -> 0L, 2L -> 10L), got.toString)
    // structural BFS DOES reach node 3 — the semantics differ on purpose
    val bfs = Bfs.shortestPaths(
      e.map(x => (x._1, x._2)).toDF("src", "dst"), Seq(1L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(bfs.contains(3L))
  }

  test("a parallel later edge re-opens the blocked path") {
    val e = Seq((1L, 2L, 10L), (2L, 3L, 5L), (2L, 3L, 20L))
    assert(run(e, Seq(1L), 3) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
  }

  test("equal times do not chain (strict >)") {
    val e = Seq((1L, 2L, 10L), (2L, 3L, 10L))
    assert(run(e, Seq(1L), 3) == Map(1L -> 0L, 2L -> 10L))
  }

  test("earliest arrival wins across alternative paths") {
    // 1→2@10→4@30 vs 1→3@50→4@60: arr(4) = 30
    val e = Seq((1L, 2L, 10L), (2L, 4L, 30L), (1L, 3L, 50L), (3L, 4L, 60L))
    assert(run(e, Seq(1L), 3) ==
      Map(1L -> 0L, 2L -> 10L, 3L -> 50L, 4L -> 30L))
  }

  test("a LATER arrival can never improve downstream (monotonicity probe)") {
    // the early path to 2 (t=10) unlocks 2→3@15; the late path (t=90) would
    // not — earliest arrival must propagate the unlocked variant
    val e = Seq((1L, 2L, 10L), (1L, 2L, 90L), (2L, 3L, 15L))
    assert(run(e, Seq(1L), 3) == Map(1L -> 0L, 2L -> 10L, 3L -> 15L))
  }

  test("reliable checkpoint mode is bit-identical") {
    val e = Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 4L, 30L), (1L, 4L, 5L))
    val dir = java.nio.file.Files.createTempDirectory("tr-ckpt").toString
    assert(run(e, Seq(1L), 3, Some(dir)) == run(e, Seq(1L), 3))
  }
}
