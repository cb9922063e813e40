package graft.queries

import graft.Q
import graft.core._
import graft.operators.{Ann, Pq, Sq8}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Oracle exactness for the cosine queries: [[graft.functions.CosineSim]]
  * accumulates dot/‖q‖²/‖c‖² as three independent sequential double sums over
  * the float elements; the DuckDB SQL reimplements exactly that (element-wise
  * DOUBLE products, sequential `list_reduce` sum, `dot/(sqrt·sqrt)`), so the
  * doubles are bit-identical on both sides.
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  /** Sequential double sum of f(i) over the vector elements, DuckDB side. */
  private def sumSql(f: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, len(q.v)), i -> $f)), (a, b) -> a + b)"

  private val cosineTopkSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        ${sumSql("q.v[i] * c.v[i]")} AS dot,
        ${sumSql("q.v[i] * q.v[i]")} AS nq,
        ${sumSql("c.v[i] * c.v[i]")} AS nc
      FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id >= 10),
      r AS (SELECT query_id, neighbor_id, dot / (sqrt(nq) * sqrt(nc)) AS cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id) AS rank
      FROM p)
      SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5
      ORDER BY query_id, rank"""

  private val pairsSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT q.vec_id AS id_a, c.vec_id AS id_b,
        ${sumSql("q.v[i] * c.v[i]")} AS dot,
        ${sumSql("q.v[i] * q.v[i]")} AS nq,
        ${sumSql("c.v[i] * c.v[i]")} AS nc
      FROM e q, e c WHERE q.vec_id < c.vec_id)
      SELECT id_a, id_b, dot / (sqrt(nq) * sqrt(nc)) AS cosine FROM p
      WHERE dot / (sqrt(nq) * sqrt(nc)) >= 0.45
      ORDER BY id_a, id_b"""

  private val knnGraphSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        ${sumSql("q.v[i] * c.v[i]")} AS dot,
        ${sumSql("q.v[i] * q.v[i]")} AS nq,
        ${sumSql("c.v[i] * c.v[i]")} AS nc
      FROM e q, e c WHERE q.vec_id <> c.vec_id),
      r AS (SELECT query_id, neighbor_id, dot / (sqrt(nq) * sqrt(nc)) AS cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id) AS rank
      FROM p)
      SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 3
      ORDER BY query_id, rank"""

  val defs: Seq[(String, Q)] = Seq(

    "embedding_cosine_topk" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Ann.bruteForceTopK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5)
      },
      Some(cosineTopkSql),
      "Exact brute-force cosine top-5 (broadcast queries, fused single-pass cosine kernel)."),

    "dedup_embedding" -> Q(
      (s, d) => Ann.pairsAboveThreshold(emb(s, d), 0.45),
      Some(pairsSql),
      "Exact pairwise embedding near-dup (cosine ≥ 0.45); the banded ANN variants are the scale path."),

    "ann_lsh" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Ann.lshTopK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5)
      },
      None, // approximate: recall vs embedding_cosine_topk is spec-checked
      "Sign-random-projection LSH ANN (4 tables × 8 bits), candidates = bucket collisions only."),

    "dedup_embedding_lsh" -> Q(
      (s, d) => Ann.lshPairs(emb(s, d), 0.45),
      None, // approximate recall of the exact pair set; spec-bounded
      "SRP-banded embedding near-dup pairs with exact-cosine verification (scale path for dedup_embedding)."),

    "semantic_dedup" -> Q(
      (s, d) => Ann.semanticDedup(emb(s, d), 0.45, k = 8, iters = 3),
      None, // iterative k-means upstream (not SQL-replayable); AnnSpec replays
            // the whole pipeline independently (local cosine + union-find)
      "SemDeDup: k-means clustering, within-cluster cosine >= 0.45 pairs only, " +
        "connected-component collapse, keep min id per group."),

    "ann_ivf" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Ann.ivfTopK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
          Ann.centroids(e), k = 5)
      },
      None, // approximate: recall vs embedding_cosine_topk is spec-checked
      "IVF ANN: coarse-quantize to label-mean codebook, probe 2 nearest cells."),

    "ann_ivf_pq" -> Q(
      (s, d) => {
        val e = emb(s, d)
        val cands = e.filter(col("vec_id") >= 10)
        val model = Pq.train(cands, m = 8, k = 16, iters = 3)
        Pq.ivfAdcTopK(e.filter(col("vec_id") < 10), cands, model, k = 5, nprobe = 4)
      },
      None, // approximate: recall vs embedding_cosine_topk is spec-checked
      "IVF-PQ ANN (IVFADC+R): 8×16 product-quantization codes (~30× smaller " +
        "than raw floats — what fits a 100 TB corpus in memory), per-query ADC " +
        "lookup tables, IVF routing, exact re-rank of the shortlist only."),

    "ann_sq8" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Sq8.topK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5)
      },
      None, // approximate: recall vs embedding_cosine_topk is spec-checked
      "SQ8 ANN: int8 max-abs scalar quantization (4x smaller vectors), integer " +
        "multiply-accumulate scan, bounded-state per-query shortlist (TopKPairs, " +
        "no window), exact cosine re-rank of the shortlist only."),

    "knn_graph" -> Q(
      (s, d) => Ann.knnGraphExact(emb(s, d), k = 3),
      Some(knnGraphSql),
      "Exact corpus kNN graph: top-3 cosine neighbors of EVERY vector (self " +
        "excluded) — O(N²) oracle baseline; knn_graph_lsh is the scale path."),

    "knn_graph_lsh" -> Q(
      (s, d) => Ann.knnGraphLsh(emb(s, d), k = 3),
      None, // approximate: edge recall vs knn_graph is spec-checked (AnnSpec)
      "Banded kNN graph: each node ranks only its SRP bucket collisions — " +
        "one (table,bucket) shuffle instead of the N² cross join."))
}
