package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sampled-source, bounded-depth betweenness centrality — Brandes'
  * dependency accumulation (forward BFS with shortest-path counts, then a
  * backward per-level sweep) restricted to a SAMPLED source set and paths
  * of at most `maxDepth` edges. Exact betweenness is O(V·E) (one BFS per
  * node — a non-starter at corpus scale); the standard estimator runs
  * Brandes from k sampled pivots (Brandes & Pich 2007), and the depth
  * bound makes the backward sweep a FIXED number of self-free equi-joins,
  * which is also what lets a DuckDB oracle replay the whole thing as
  * unrolled SQL.
  *
  * All arithmetic is integer: path counts σ are exact BIGINT sums, and
  * dependencies accumulate as e6-scaled floors
  * `δ(v) += ⌊σ_v · (10⁶ + δ(w)) / σ_w⌋` per successor edge — a sum of
  * per-edge floored terms, order-independent, so the iterate is bit-exact
  * on both engines (the PageRank discipline). Per hop the forward pass is
  * one keyed shuffle (frontier ⋈ edges) + one (s, node) aggregate + one
  * anti join; the backward pass is one (s, node) equi-join per level.
  * State is O(|sources| · reached) — the sampling makes that multiplier a
  * small constant.
  */
object Betweenness {

  private val Scale = 1000000L

  /** @param edges   (src, dst) directed edges (emit both directions for an
    *                undirected graph)
    * @param sources (node) sampled pivot set
    * @param maxDepth maximum path length counted (inclusive)
    * @return (node, bc_e6) — Σ over pivots of the e6-floored dependency;
    *         one row per node appearing at levels 1..maxDepth−1 of any
    *         pivot's BFS (the only places a counted shortest path can have
    *         an intermediate), 0 when it is never intermediate */
  def sampled(edges: DataFrame, sources: DataFrame, maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxDepth >= 2, "betweenness needs maxDepth >= 2 (an intermediate)")
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")))

    // ---- forward: per-level (s, node, sigma) with sigma = #shortest paths.
    // Every dist-(k-1) predecessor of a node first reached at dist k is in
    // level k-1 (BFS level = first-discovery hop), so summing sigma over
    // frontier-edge arrivals counts ALL shortest paths, not a sample.
    val lvl0 = ckpt(sources.select(col("node").cast("long")).distinct()
      .select(col("node").as("s"), col("node"), lit(1L).as("sigma")))
    var levels = Vector(lvl0)
    var settled = lvl0.select(col("s"), col("node"))
    var k = 1
    while (k <= maxDepth) {
      val frontier = levels.last
      val cand = frontier.withColumnRenamed("node", "src")
        .join(e, "src")
        .groupBy(col("s"), col("dst").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
      val fresh = ckpt(cand.join(settled, Seq("s", "node"), "left_anti"))
      levels = levels :+ fresh
      // settled stays a LAZY union of already-checkpointed level frames
      // (r16): each `fresh` is materialized above, so the union's lineage is
      // O(levels) references to cached blocks — re-materializing the whole
      // settled set per hop repaid the union every level for nothing.
      // (An e-repartition-by-src experiment was REVERTED here: with the
      // edge table pre-partitioned the per-hop joins planned as sorted SMJs
      // over it, while the unpartitioned form lets AQE broadcast the small
      // frontier/successor sides at runtime — measured 8.5 s vs 6.0 s at
      // sf0.1. AQE's runtime choice IS the scale-adaptive behavior: huge
      // frontiers exceed the broadcast threshold and fall back to the keyed
      // join.)
      settled = settled.unionByName(fresh.select(col("s"), col("node")))
      k += 1
    }

    // ---- backward: delta sweeps from the deepest level toward the pivots.
    // delta(v) = sum over successors w (dist +1) of
    //   floor(sigma_v * (Scale + delta_w) / sigma_w), widened to
    // DECIMAL(38,0) so sigma_v * (Scale + delta_w) can't wrap.
    val d38 = DecimalType(38, 0)
    // The sweep iterate carries (s, node, sigma, delta) — sigma rides along
    // (r17) so each sweep joins the exploded DAG-edge frame (the big side:
    // frontier × out-degree rows) against ONE successor frame instead of
    // two. The former succSigma⋈succ pair were both keyed by the SAME
    // (s, node) rows of levels(l+1), a 1:1 join — fusing them halves the
    // number of big-side joins per level (guide §3: the deepest sweep's
    // 6 M-row join was the costliest single job in the graph family).
    var delta = levels(maxDepth)
      .select(col("s"), col("node"), col("sigma"), lit(0L).as("delta"))
    // bc rows: dependencies of nodes at levels 1..maxDepth-1 (pivots are
    // excluded from their own accounting, per Brandes; the deepest level
    // has delta 0 and contributes nothing)
    var contrib = Vector.empty[DataFrame]
    // sweep stops at level 1: pivots (level 0) are excluded from their own
    // accounting per Brandes, so their dependency is never read
    var l = maxDepth - 1
    while (l >= 1) {
      val succ = delta.select(col("s"), col("node").as("w_node"),
        col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      // only edges landing on dist-(l+1) nodes survive the inner join with
      // the next level — exactly the shortest-path-DAG edges out of level l
      val agg = levels(l).withColumnRenamed("node", "src")
        .join(e, "src")
        .select(col("s"), col("src").as("node"), col("sigma"),
          col("dst").as("w_node"))
        .join(succ, Seq("s", "w_node"))
        .groupBy(col("s"), col("node"))
        .agg(sum(
          graft.core.idiv(
            col("sigma").cast(d38) * (lit(Scale) + col("delta_w")).cast(d38),
            col("sigma_w").cast(d38))).as("delta"))
      // a level-l node with NO dist-(l+1) successor (a within-bound leaf)
      // has dependency 0 but must stay visible to the next sweep and to the
      // final sum — left join + coalesce keeps every level-l row (and its
      // sigma, for the next sweep's fused successor frame)
      val d = ckpt(levels(l).select(col("s"), col("node"), col("sigma"))
        .join(agg, Seq("s", "node"), "left")
        .select(col("s"), col("node"), col("sigma"),
          coalesce(col("delta"), lit(0L)).as("delta")))
      delta = d
      contrib = contrib :+ d.select(col("s"), col("node"), col("delta"))
      l -= 1
    }

    contrib.reduce(_ unionByName _)
      .groupBy(col("node"))
      .agg(sum(col("delta")).as("bc_e6"))
      .orderBy(col("node"))
  }
}
