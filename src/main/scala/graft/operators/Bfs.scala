package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-depth single/multi-source BFS (unweighted shortest paths) as
  * iterative frontier joins — the Pregel shape on DataFrames.
  *
  * Per hop: one keyed shuffle (frontier ⋈ edges by src), a distinct on the
  * discovered set, and an anti join against settled nodes so the frontier
  * only ever carries NEWLY reached nodes — state is O(reached), the frontier
  * shrinks as the graph saturates, and the driver holds nothing but the loop
  * counter. This is the scalable formulation: a naive walk-level expansion
  * (neighbors of the full previous level, no settled filter) revisits every
  * node each hop and blows up with the walk count at 100 TB; the oracle uses
  * exactly that naive expansion + a final MIN, which is equivalent on output
  * (min walk length = shortest-path distance) while staying SQL-expressible.
  *
  * Equivalence and frontier-disjointness are additionally spec-locked in
  * GraphSpec against a driver-side Dijkstra on a small corpus.
  */
object Bfs {

  /** @param edges   (src, dst) directed edge list (emit both directions for
    *                an undirected graph)
    * @param sources (node) seed set, distance 0
    * @param maxDepth inclusive hop bound
    * @return (node, dist) for every node reached within maxDepth hops */
  def shortestPaths(edges: DataFrame, sources: DataFrame, maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    // Checkpoint per hop truncates the growing lineage (the PageRank /
    // KMeans iterative-operator discipline) and keeps every join a fresh
    // two-sided equi-join rather than an ambiguous self-join; reliable
    // when checkpointDir is set (executor-loss-safe), local otherwise.
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    var settled = ckpt(sources.select(col("node").cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L)))
    var frontier = settled.select(col("node"))
    var prevFresh: Option[DataFrame] = None
    var k = 1
    while (k <= maxDepth) {
      val discovered = frontier.select(col("node").as("src"))
        .join(e, "src").select(col("dst").as("node")).distinct()
      val fresh = ckpt(discovered.join(settled, Seq("node"), "left_anti")
        .withColumn("dist", lit(k.toLong)))
      // fresh(k) is materialized, so fresh(k-1) — whose only consumer was
      // this hop's frontier join — is now retirable; settled(k-1) after
      // settled(k) below
      prevFresh.foreach(ckpt.retire); prevFresh = Some(fresh)
      val prevSettled = settled
      settled = ckpt(settled.unionByName(fresh))
      ckpt.retire(prevSettled)
      frontier = fresh.select(col("node"))
      k += 1
    }
    settled
  }

  /** PER-SOURCE bounded-depth BFS — [[shortestPaths]] keyed by (source,
    * node) instead of collapsing to the min over sources: the landmark /
    * sampled-source primitive centrality estimators build on (closeness,
    * betweenness, eccentricity sketches à la Eppstein–Wang). State is
    * O(|sources| · reached) — the point of SAMPLING the sources is exactly
    * that |sources| is a small constant, so the multiplier is fixed and
    * every hop stays one keyed shuffle + one distinct + one anti join, the
    * [[shortestPaths]] shape with a wider key.
    *
    * @return (s, node, dist) for every (source, node) pair reached within
    *         maxDepth hops; the (s, s, 0) self rows are included */
  def perSourceDistances(edges: DataFrame, sources: DataFrame, maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))
    var settled = ckpt(sources.select(col("node").cast("long")).distinct()
      .select(col("node").as("s"), col("node"), lit(0L).as("dist")))
    var frontier = settled.select(col("s"), col("node"))
    var prevFresh: Option[DataFrame] = None
    var k = 1
    while (k <= maxDepth) {
      val discovered = frontier.withColumnRenamed("node", "src")
        .join(e, "src").select(col("s"), col("dst").as("node")).distinct()
      val fresh = ckpt(discovered.join(settled, Seq("s", "node"), "left_anti")
        .withColumn("dist", lit(k.toLong)))
      prevFresh.foreach(ckpt.retire); prevFresh = Some(fresh)
      val prevSettled = settled
      settled = ckpt(settled.unionByName(fresh))
      ckpt.retire(prevSettled)
      frontier = fresh.select(col("s"), col("node"))
      k += 1
    }
    settled
  }

  /** Bounded-hop WEIGHTED shortest paths — Bellman–Ford with delta
    * relaxation: each round relaxes only out-edges of nodes whose distance
    * IMPROVED last round (the frontier), not every settled node, so work per
    * hop tracks the wave of change rather than |reached| and dies out as
    * distances converge. After k rounds, `dist` is exactly the cheapest path
    * using ≤ k edges (the Bellman–Ford invariant), which the oracle replays
    * as k unrolled min-per-node CTE steps. Integer weights keep the iterate
    * bit-exact on both engines — the same trick as scaled-integer PageRank.
    *
    * Per hop: one keyed shuffle (frontier ⋈ edges by src), a map-side-
    * combinable min per discovered node, and a co-partitioned left join
    * against `dist` to keep only strict improvements. Never materializes
    * walks — state is one row per reached node.
    *
    * @param edges (src, dst, w) directed weighted edge list, w ≥ 0
    * @return (node, dist) cheapest ≤-maxHops-edge path weight per reached node */
  def weightedShortestPaths(edges: DataFrame, sources: DataFrame, maxHops: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w")))
    var dist = ckpt(sources.select(col("node").cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L)))
    var frontier = dist
    var prevBetter: Option[DataFrame] = None
    var k = 1
    while (k <= maxHops) {
      val cand = frontier.select(col("node").as("src"), col("dist"))
        .join(e, "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy("node").agg(min(col("nd")).as("nd"))
      val better = ckpt(cand.join(dist, Seq("node"), "left_outer")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("node"), col("nd").as("dist")))
      prevBetter.foreach(ckpt.retire); prevBetter = Some(better)
      val prevDist = dist
      dist = ckpt(dist.unionByName(better)
        .groupBy("node").agg(min(col("dist")).as("dist")))
      ckpt.retire(prevDist) // superseded once dist(k) is materialized
      frontier = better
      k += 1
    }
    dist
  }

  /** TIME-RESPECTING reachability (temporal graph): earliest arrival at each
    * node using only paths whose edge timestamps strictly increase — an edge
    * (u, v, t) is traversable only when `t > arrival(u)`. The propagation
    * shape every "who could information have reached, in causal order"
    * analysis needs (contact tracing, fraud-ring spread, rumor paths) and
    * what plain BFS gets WRONG: a structural path is useless if its later
    * hop happened before its earlier one.
    *
    * Same delta-relaxation discipline as [[weightedShortestPaths]]: only
    * nodes whose arrival improved relax their out-edges (sound because a
    * smaller arrival only ever UNLOCKS more edges — `t > arr` is monotone in
    * arr — so the improved node is the only place new paths can start), one
    * keyed shuffle + one aggregate per hop, [[Checkpointer]] lineage
    * truncation. Seeds start at arrival 0.
    *
    * @param edges (src, dst, t) directed timestamped edges
    * @return (node, arr) earliest arrival per reached node; seeds arr 0 */
  def temporalReachability(edges: DataFrame, sources: DataFrame, maxHops: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("t").cast("long").as("t")))
    var arr = ckpt(sources.select(col("node").cast("long").as("node")).distinct()
      .withColumn("arr", lit(0L)))
    var frontier = arr
    var prevBetter: Option[DataFrame] = None
    var k = 1
    while (k <= maxHops) {
      val cand = frontier.select(col("node").as("src"), col("arr"))
        .join(e, "src")
        .filter(col("t") > col("arr"))
        .select(col("dst").as("node"), col("t").as("na"))
        .groupBy("node").agg(min(col("na")).as("na"))
      val better = ckpt(cand.join(arr, Seq("node"), "left_outer")
        .filter(col("arr").isNull || col("na") < col("arr"))
        .select(col("node"), col("na").as("arr")))
      prevBetter.foreach(ckpt.retire); prevBetter = Some(better)
      val prevArr = arr
      arr = ckpt(arr.unionByName(better)
        .groupBy("node").agg(min(col("arr")).as("arr")))
      ckpt.retire(prevArr)
      frontier = better
      k += 1
    }
    arr
  }
}
