package graft

import graft.operators.{Betweenness, Bfs}
import org.apache.spark.sql.functions._

/** Betweenness.sampled vs a driver-side reference Brandes (bounded depth,
  * same e6-floor discipline), plus structural sanities and the per-source
  * BFS primitive it builds on.
  */
class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bounded-depth Brandes with the identical integer floors:
    * per source BFS levels + sigma, then the backward e6 sweep. */
  private def reference(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxDepth: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val bc = scala.collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
    sources.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> BigInt(1))
      var frontier = Seq(s)
      for (k <- 1 to maxDepth) {
        val next = scala.collection.mutable.Map.empty[Long, BigInt]
        frontier.foreach { v =>
          adj.getOrElse(v, Nil).foreach { w =>
            if (!dist.contains(w)) next(w) = next.getOrElse(w, BigInt(0)) + sigma(v)
          }
        }
        next.foreach { case (w, sg) => dist(w) = k; sigma(w) = sg }
        frontier = next.keys.toSeq
      }
      val delta = scala.collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
      for (l <- (maxDepth - 1) to 1 by -1) {
        val lvl = dist.collect { case (v, dl) if dl == l => v }
        lvl.foreach { v =>
          var acc = BigInt(0)
          adj.getOrElse(v, Nil).foreach { w =>
            if (dist.get(w).contains(l + 1))
              acc += sigma(v) * (BigInt(1000000) + delta(w)) / sigma(w)
          }
          delta(v) = acc
          bc(v) = bc(v) + acc
        }
      }
    }
    bc.map { case (k, v) => k -> v.toLong }.toMap
  }

  test("sampled betweenness equals the reference Brandes on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges0 = (1 to 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = edges0 ++ edges0.map(_.swap) // undirected
    val sources = Seq(0L, 1L, 2L, 3L, 4L)
    val got = Betweenness.sampled(edges.toDF("src", "dst"),
        sources.toDF("node"), maxDepth = 3)
      .as[(Long, Long)].collect().toMap
    val want = reference(edges, sources, 3)
    // the engine emits every level-1..2 node (0 allowed); the reference map
    // defaults to 0 — compare on the union of keys
    (got.keySet ++ want.keySet).foreach { v =>
      assert(got.getOrElse(v, 0L) == want.getOrElse(v, 0L),
        s"node $v: got ${got.get(v)}, want ${want.get(v)}")
    }
  }

  test("star graph: the hub carries all dependency, leaves carry none") {
    val n = 8L
    val edges = (1L to n).flatMap(i => Seq((0L, i), (i, 0L)))
    val got = Betweenness.sampled(edges.toDF("src", "dst"),
        Seq(1L, 2L).toDF("node"), maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    // from each leaf pivot, the hub is the sole intermediate to the other
    // n-1 leaves: delta(hub) = (n-1) * 1e6 per pivot
    assert(got(0L) == 2 * (n - 1) * 1000000L, got.toString)
    assert(got.filter(_._1 != 0L).forall(_._2 == 0L), got.toString)
  }

  test("perSourceDistances: min over sources equals the collapsed BFS") {
    val d = sf("sf0.001")
    val edges = queries.Graph.edges(spark, d)
    val sources = core.table(spark, d, "customer")
      .filter(col("c_custkey") <= 20).select(col("c_custkey").as("node"))
    val per = Bfs.perSourceDistances(edges, sources, 4)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      .as[(Long, Long)].collect().toMap
    val collapsed = Bfs.shortestPaths(edges, sources, 4)
      .as[(Long, Long)].collect().toMap
    assert(per == collapsed)
  }
}
