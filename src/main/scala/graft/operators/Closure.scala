package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive ancestor closure of a parent-pointer hierarchy to
  * CONVERGENCE — the unbounded-depth recursive-CTE surface (`WITH
  * RECURSIVE` / CONNECT BY without a LEVEL cap), where
  * `hierarchy_closure`'s fixed-depth unroll stops at 3.
  *
  * Frontier iteration: round k joins the depth-k frontier against the edge
  * set and stops when the frontier empties — per-round state is the
  * FRONTIER only (rows still extending), one keyed shuffle per hop, and a
  * [[Checkpointer]] truncates lineage so a 40-level hierarchy does not
  * build a 40-join plan. Convergence is data-driven (a `limit(1)`
  * emptiness probe per round, the cheapest action that proves
  * termination), never a guessed depth constant. Earlier levels stay
  * checkpointed (the RESULT is their union), so nothing is retired —
  * unlike the PageRank iterate, every generation here is output.
  *
  * Scale note: frontier iteration costs O(depth) rounds; for pathological
  * depths (linked-list hierarchies) path doubling would cut that to
  * O(log depth) at the price of materializing the full closure each round
  * — org hierarchies / part trees are O(log n) deep, so the frontier shape
  * wins. Cycles would not terminate (same contract as a recursive CTE
  * under UNION ALL); feed DAGs.
  */
object Closure {

  /** @param edges (id, pid) parent pointers; roots simply absent as ids.
    * @return (id, anc, depth): every ancestor of every node, depth ≥ 1. */
  def ancestors(edges: DataFrame, checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("id").cast("long").as("id"),
      col("pid").cast("long").as("pid")))
    var lvl = ckpt(e.select(col("id"), col("pid").as("anc"), lit(1L).as("depth")))
    var out = lvl
    var depth = 1L
    var frontierAlive = lvl.limit(1).count() > 0
    while (frontierAlive) {
      depth += 1
      val next = ckpt(lvl.join(e.select(col("id").as("anc"), col("pid").as("anc2")), "anc")
        .select(col("id"), col("anc2").as("anc"), lit(depth).as("depth")))
      frontierAlive = next.limit(1).count() > 0
      if (frontierAlive) out = out.unionByName(next)
      lvl = next
    }
    out.orderBy(col("id"), col("depth"), col("anc"))
  }
}
