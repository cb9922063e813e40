package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by iterative peeling — the classic graph-curation
  * primitive (drop weakly-connected debris before running expensive graph
  * analytics; the "dense enough to matter" filter for link graphs at crawl
  * scale).
  *
  * Each round removes every node whose CURRENT degree is below k (removing
  * a node lowers its neighbors' degrees, so peeling cascades); the k-core
  * is the fixpoint. Peeling is MONOTONE — once converged, further rounds
  * are no-ops — so running a FIXED `rounds` count is deterministic and
  * equals the fixpoint whenever `rounds` covers the cascade depth; the
  * early-exit when a round removes nothing is a pure optimization. That
  * fixed-unroll property is what makes the operator ORACLE-checkable: the
  * SQL replay unrolls the same rounds as chained CTEs (the PageRank
  * discipline), and integer degrees need no tolerance gate.
  *
  * Scale shape per round: one groupBy(src) degree aggregate (map-side
  * combinable) + two semi-joins of the edge list against the O(survivors)
  * keep-set — all keyed shuffles, nothing driver-side but the loop counter
  * and the one-scalar early-exit count. Lineage is truncated per round by
  * a [[Checkpointer]] (reliable when `checkpointDir` is set), superseded
  * iterates are [[Checkpointer.retire]]d.
  *
  * @param edges (src, dst) with BOTH directions present for an undirected
  *              graph (the degree of `src` is its out-degree here)
  * @return (node, core_degree): nodes of the k-core with their degree
  *         inside the core
  */
object KCore {

  def kCore(edges: DataFrame, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    val ckpt = new Checkpointer(checkpointDir)
    var e = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct())
    var n = e.count()
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      val prev = e
      e = ckpt(e.join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
      val n2 = e.count()
      ckpt.retire(prev)
      stable = n2 == n
      n = n2
      r += 1
    }
    e.groupBy("src").agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("node"), col("core_degree"))
      .orderBy("node")
  }
}
