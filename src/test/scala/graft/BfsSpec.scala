package graft

import graft.operators.Bfs
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Frontier BFS vs a sequential driver-side BFS, plus the structural
  * guarantees the anti-join formulation must keep: one row per reached node,
  * distances exactly the shortest-path lengths, unreached nodes absent. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def referenceBfs(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxDepth: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = mutable.Map[Long, Long](sources.map(_ -> 0L): _*)
    var frontier = sources.toSet
    for (k <- 1 to maxDepth) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = k.toLong)
    }
    dist.toMap
  }

  test("matches a sequential BFS on a random graph, one row per node") {
    val rnd = new scala.util.Random(42)
    val edges0 = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val edges = (edges0 ++ edges0.map(_.swap)).distinct // undirected
    val sources = Seq(0L, 7L)
    val got = Bfs.shortestPaths(
        edges.toDF("src", "dst"), sources.toDF("node"), 3)
      .as[(Long, Long)].collect()
    assert(got.map(_._1).distinct.length == got.length, "duplicate node rows")
    assert(got.toMap == referenceBfs(edges, sources, 3))
  }

  test("chain graph: distances are exact hops and the depth bound cuts off") {
    // 0 -> 1 -> 2 -> ... -> 9; depth 4 reaches only 0..4
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = Bfs.shortestPaths(
        chain.toDF("src", "dst"), Seq(0L).toDF("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("a cycle does not re-discover settled nodes at a longer distance") {
    // triangle 1-2-3 plus a pendant: settled nodes must keep their first
    // (minimal) distance even though longer walks revisit them
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L), (3L, 4L))
    val got = Bfs.shortestPaths(
        edges.toDF("src", "dst"), Seq(1L).toDF("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("isolated source appears at distance 0; unreached nodes are absent") {
    val edges = Seq((10L, 11L))
    val got = Bfs.shortestPaths(
        edges.toDF("src", "dst"), Seq(99L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(99L -> 0L))
  }

  // ---- weightedShortestPaths ----------------------------------------------

  private def referenceBellmanFord(edges: Seq[(Long, Long, Long)],
      sources: Seq[Long], maxHops: Int): Map[Long, Long] = {
    var dist = sources.map(_ -> 0L).toMap
    for (_ <- 1 to maxHops) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }.groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).min }
      dist = (dist.keySet ++ relaxed.keySet).map { n =>
        n -> math.min(dist.getOrElse(n, Long.MaxValue),
          relaxed.getOrElse(n, Long.MaxValue))
      }.toMap
    }
    dist
  }

  test("weighted: matches sequential Bellman-Ford on a random weighted graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong, 1L + rnd.nextInt(9))).distinct
    val sources = Seq(0L, 5L)
    val got = Bfs.weightedShortestPaths(
        edges.toDF("src", "dst", "w"), sources.toDF("node"), 4)
      .as[(Long, Long)].collect()
    assert(got.map(_._1).distinct.length == got.length, "duplicate node rows")
    assert(got.toMap == referenceBellmanFord(edges, sources, 4))
  }

  test("weighted: a cheaper longer-hop path overrides an earlier direct edge") {
    // 0->1 costs 10 directly but 2 via 0->2->1: the hop-2 relaxation must
    // IMPROVE node 1's hop-1 distance (the case plain BFS cannot express)
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 1L))
    val got = Bfs.weightedShortestPaths(
        edges.toDF("src", "dst", "w"), Seq(0L).toDF("node"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 2L, 2L -> 1L))
  }

  test("weighted: hop bound caps the path length, not the weight") {
    // chain 0->1->2->3 of weight-5 edges, depth 2: node 3 unreached even
    // though its weight (15) is finite
    val chain = Seq((0L, 1L, 5L), (1L, 2L, 5L), (2L, 3L, 5L))
    val got = Bfs.weightedShortestPaths(
        chain.toDF("src", "dst", "w"), Seq(0L).toDF("node"), 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 5L, 2L -> 10L))
  }

  test("weighted: agrees with unweighted BFS when all weights are 1") {
    val rnd = new scala.util.Random(11)
    val e0 = (1 to 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).distinct
    val bfs = Bfs.shortestPaths(e0.toDF("src", "dst"), Seq(0L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    val wsp = Bfs.weightedShortestPaths(
        e0.map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "w"),
        Seq(0L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(wsp == bfs)
  }
}
