package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the directed
  * companion to [[NearDup.connectedComponents]] (which answers the
  * undirected question): u and v share a component iff each can reach the
  * other along edge directions. The dependency-cycle / mutual-reference
  * primitive (circular supply chains, crawl link cycles, retraction loops).
  *
  * Algorithm: the classic distributed COLORING scheme (FW-BW/MultiStep
  * family), each outer round peeling EVERY root's component in parallel:
  *  1. TRIM to fixpoint: a node with no in-edges or no out-edges in the
  *     active subgraph is its own singleton SCC (peels DAG tendrils without
  *     paying a coloring round per node);
  *  2. COLOR: forward min-label propagation to fixpoint — c(v) = min id
  *     that reaches v within the active subgraph;
  *  3. EXTRACT: backward mark from every root (c(v) = v) along edges whose
  *     BOTH endpoints share the root's color; marked(v) ⇔ v ∈ SCC(root)
  *     (classical invariant: every SCC member has the root's color, and a
  *     member's path to the root stays inside the SCC);
  *  4. remove extracted nodes, repeat.
  * scc_id = the component's MINIMUM member id (the root: nothing smaller
  * reaches it, so no smaller member exists) — canonical, engine-neutral,
  * and exactly what the oracle's mutual-reachability replay computes.
  *
  * Scale shape: every step is keyed equi-joins + min/exists aggregates over
  * the active node set (never materializing reachability pairs); iterates
  * are [[Checkpointer]]-truncated and retired. Outer rounds = SCC
  * condensation peeling depth after trimming — small on real graphs (one
  * giant SCC + tendrils); a loud cap guards the pathological regime.
  */
object Scc {

  /** @param edges (src: long, dst: long) directed; duplicates collapsed.
    * @return (node, scc_id) for every node appearing in `edges`, scc_id =
    *         min member id of the node's strongly connected component. */
  def run(edges: DataFrame, checkpointDir: Option[String] = None,
      maxRounds: Int = 100): DataFrame = {
    val ckpt = new Checkpointer(checkpointDir)
    val e0 = ckpt(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct())
    var active = ckpt(e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct())
    val done = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var rounds = 0
    while (active.limit(1).count() > 0) {
      rounds += 1
      require(rounds <= maxRounds,
        s"SCC did not converge in $maxRounds peeling rounds — " +
          "pathologically deep condensation; raise maxRounds")
      // active-subgraph edges (both endpoints alive)
      var e = ckpt(e0
        .join(active.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(active.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi"))
      // 1. trim to fixpoint: no-in or no-out nodes are singleton SCCs
      var trimmed = 1L
      while (trimmed > 0) {
        val hasIn = e.select(col("dst").as("node")).distinct()
        val hasOut = e.select(col("src").as("node")).distinct()
        val singles = active.join(hasIn, Seq("node"), "left_anti")
          .unionByName(active.join(hasOut, Seq("node"), "left_anti"))
          .distinct()
        trimmed = singles.count()
        if (trimmed > 0) {
          done += ckpt(singles.select(col("node"), col("node").as("scc_id")))
          val prevA = active; val prevE = e
          active = ckpt(active.join(singles, Seq("node"), "left_anti"))
          e = ckpt(e
            .join(active.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .join(active.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi"))
          ckpt.retire(prevA); ckpt.retire(prevE)
        }
      }
      if (active.limit(1).count() == 0) ()
      else {
        // 2. color: forward min-label to fixpoint (c(v) = min id reaching v)
        var c = ckpt(active.withColumn("color", col("node")))
        var changed = 1L
        while (changed > 0) {
          val viaIn = e.join(c, e("src") === c("node"))
            .select(e("dst").as("node"), col("color"))
          val next = ckpt(c.unionByName(viaIn)
            .groupBy("node").agg(min("color").as("color")))
          changed = next.as("n").join(c.as("o"), "node")
            .filter(col("n.color") < col("o.color")).count()
          ckpt.retire(c)
          c = next
        }
        // 3. extract: backward mark from roots within same-color edges
        val sameColorEdges = ckpt(e
          .join(c.select(col("node").as("src"), col("color").as("sc")), Seq("src"))
          .join(c.select(col("node").as("dst"), col("color").as("dc")), Seq("dst"))
          .filter(col("sc") === col("dc"))
          .select(col("src"), col("dst"), col("sc").as("color")))
        var marked = ckpt(c.filter(col("node") === col("color"))
          .select(col("node"), col("color")))
        var grew = 1L
        while (grew > 0) {
          val before = marked.count()
          val viaOut = sameColorEdges
            .join(marked.select(col("node").as("dst"), col("color").as("mc")), Seq("dst"))
            .filter(col("color") === col("mc"))
            .select(col("src").as("node"), col("color"))
          val next = ckpt(marked.unionByName(viaOut).distinct())
          grew = next.count() - before
          ckpt.retire(marked)
          marked = next
        }
        done += ckpt(marked.select(col("node"), col("color").as("scc_id")))
        val prevA = active
        active = ckpt(active.join(marked.select(col("node")), Seq("node"), "left_anti"))
        ckpt.retire(prevA); ckpt.retire(c); ckpt.retire(marked)
        ckpt.retire(sameColorEdges)
      }
      ckpt.retire(e)
    }
    if (done.isEmpty)
      active.select(col("node"), col("node").as("scc_id")) // empty edge set
    else done.reduce(_ unionByName _).orderBy("node")
  }
}
