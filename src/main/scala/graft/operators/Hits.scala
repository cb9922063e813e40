package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-round HITS (hubs & authorities) over a directed edge list — the
  * second classic link-analysis iterate beside [[PageRank]], and the one
  * whose two-sided scores fit bipartite interaction graphs (buyers→sellers,
  * queries→documents) where PageRank's single rank conflates the roles.
  *
  * Same scaled-integer discipline as [[PageRank]]: scores are units of
  * `scale = 10^12`, each half-step is `raw = Σ counterpart-score over
  * incident edges` then a SUM-normalization `score = (scale·raw) DIV total`
  * (the textbook uses L2 — sum normalization keeps the arithmetic integral
  * and the ranking identical, since both are positive rescalings). The
  * `scale·raw` product rides DECIMAL(38,0): raw can reach deg_max·scale
  * (≈10^17 here), so the BIGINT product would overflow on the first round.
  * Integer sums are order-independent → bit-exact under any scheduling, and
  * oracle-checkable against an unrolled SQL replay.
  *
  * Scale shape per round: two keyed shuffles per half-step (edges ⋈ scores
  * on one endpoint, aggregate on the other) plus a broadcast one-row total
  * for the normalization — never a driver collect. Score frames are
  * [[Checkpointer]]-truncated per round, executor-local by default and
  * reliable when `checkpointDir` is set (the executor-loss-safe mode).
  */
object Hits {

  private val D38 = DecimalType(38, 0)

  /** @param edges (src: long, dst: long) directed; duplicates collapsed.
    * @return (node: long, role: string 'hub'|'auth', score_scaled: long) —
    *         hub scores for every distinct src, authority scores for every
    *         distinct dst (a node appearing on both sides gets both rows).
    */
  def run(edges: DataFrame, rounds: Int, scale: Long = 1000000000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val ckpt = new Checkpointer(checkpointDir)
    val e = ckpt(edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct())
    val hubs = ckpt(e.select(col("src").as("node")).distinct())
    val nHubs = hubs.count()
    require(nHubs >= 1, "empty edge set")

    // h0 = scale DIV n_hubs for every hub (any positive constant works; a
    // deterministic one keeps the replay exact).
    var h = ckpt(hubs.select(col("node"), lit(scale / nHubs).as("h")))
    var a: DataFrame = null
    for (_ <- 1 to rounds) {
      // authority half-step: pull hub scores along in-edges, normalize.
      val rawA = e.join(h, e("src") === h("node"))
        .groupBy(e("dst").as("node")).agg(sum(col("h")).as("raw"))
      val ta = rawA.agg(sum(col("raw")).as("t"))
      a = ckpt(rawA.crossJoin(broadcast(ta))
        .select(col("node"),
          graft.core.idiv(lit(scale).cast(D38) * col("raw").cast(D38),
            col("t").cast(D38)).as("a")))
      // hub half-step: pull the fresh authority scores along out-edges.
      val rawH = e.join(a, e("dst") === a("node"))
        .groupBy(e("src").as("node")).agg(sum(col("a")).as("raw"))
      val th = rawH.agg(sum(col("raw")).as("t"))
      val prev = h
      h = ckpt(rawH.crossJoin(broadcast(th))
        .select(col("node"),
          graft.core.idiv(lit(scale).cast(D38) * col("raw").cast(D38),
            col("t").cast(D38)).as("h")))
      ckpt.retire(prev)
    }
    h.select(col("node"), lit("hub").as("role"), col("h").as("score_scaled"))
      .unionByName(a.select(col("node"), lit("auth").as("role"),
        col("a").as("score_scaled")))
      .orderBy("role", "node")
  }
}
