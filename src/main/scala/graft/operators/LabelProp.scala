package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection): every node starts
  * labeled with its own id; each round, every node adopts the label most
  * frequent among its in-neighbors, ties broken by the SMALLEST label. With
  * the deterministic tie-break the fixed-round iterate is pure integer
  * state — exactly replayable as unrolled SQL, so an oracle can check it
  * (same discipline as [[PageRank]] / [[KCore]]).
  *
  * Scale shape: each round is one edges⨝labels join (co-partitioned on the
  * label side after round 1) plus two aggregations — (dst, label) counts,
  * then the per-dst argmax as a single `max(struct(cnt, −label))` hash
  * aggregate (NO per-node window: at 100 TB a row_number window over every
  * (node, label) pair re-sorts the whole state each round; the struct-max is
  * a partial-aggregating one-pass). State is O(nodes); lineage is truncated
  * every round by [[Checkpointer]] (executor-local by default, reliable
  * with a `checkpointDir` — the executor-loss story in SURVEY §4).
  *
  * Caller contract: `edges(src, dst)` should be symmetric (undirected) so
  * every node has in-edges; a node with none would keep no row after a
  * round. Rounds are fixed, not converged-to: synchronous LPA can oscillate
  * (2-cycles on bipartite structures), and a fixed unroll is what the SQL
  * replay can mirror bit-exactly.
  */
object LabelProp {

  def run(edges: DataFrame, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = new Checkpointer(checkpointDir)
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node")).distinct()
    var labels = ckpt(nodes.withColumn("label", col("node")))
    for (_ <- 1 to rounds) {
      val prev = labels
      val next = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      labels = ckpt(next)
      ckpt.retire(prev)
    }
    labels.orderBy("node")
  }
}
