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

  /** DuckDB replay of [[Ann.lshTopK]] with `polySigns = true`: per (vector,
    * table) the numBits hyperplane signs come from the same per-lane
    * LCG-multiplier construction as [[graft.functions.Kernels
    * .signRandomProjectionPoly]] (odd multiplier from two LCG rounds of the
    * lane key, sign = bit 30 of mult·i + h0 mod 2^31), the per-bit
    * accumulations are the same sequential double sums the cosine oracles
    * replay, then bucket-collision join, DISTINCT candidate pairs, exact
    * cosine top-k.
    */
  /** The LCG bucket CTE shared by the LSH oracles: per (vector, table) the
    * numBits signs from seedBase + tbl (see lshTopkSql doc). */
  private def lshBucketCte(seedBase: Int, numTables: Int, numBits: Int): String = {
    // per-(table, bit) odd multiplier from two LCG rounds of the lane key,
    // then sign_i = bit 30 of (mult·i + h0) mod 2^31 — the diverse-hyperplane
    // construction of Kernels.signRandomProjectionPoly (SQL i is 1-based,
    // matching the kernel's (i+1))
    def sign(j: Int) = {
      val h0 = s"((1103515245*(($seedBase + t.tbl)*100003 + ${j * 8192L}) + 12345) % 2147483648)"
      s"""(CASE WHEN (((2*((1103515245*$h0 + 12345) % 2147483648) + 1) * i + $h0)
          % 2147483648) // 1073741824 = 1
        THEN 1.0 ELSE -1.0 END)"""
    }
    val bucketExpr = (0 until numBits).map { j =>
      s"(CASE WHEN ${sumSql(s"${sign(j)} * q.v[i]")} >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""buck AS (SELECT q.vec_id, t.tbl, $bucketExpr AS bucket
        FROM e q CROSS JOIN
          (SELECT unnest(generate_series(0, ${numTables - 1})) AS tbl) t)"""
  }

  private def lshTopkSql(numTables: Int, numBits: Int, k: Int): String = {
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${lshBucketCte(1000, numTables, numBits)},
      cand AS (SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM buck qb JOIN buck cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
        WHERE qb.vec_id < 10 AND cb.vec_id >= 10),
      p AS (SELECT cand.query_id, cand.neighbor_id,
          ${sumSql("q.v[i] * c.v[i]")} AS dot,
          ${sumSql("q.v[i] * q.v[i]")} AS nq,
          ${sumSql("c.v[i] * c.v[i]")} AS nc
        FROM cand JOIN e q ON q.vec_id = cand.query_id
        JOIN e c ON c.vec_id = cand.neighbor_id),
      r AS (SELECT query_id, neighbor_id, dot / (sqrt(nq) * sqrt(nc)) AS cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id) AS rank
      FROM p)
      SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= $k
      ORDER BY query_id, rank"""
  }

  /** DuckDB replay of [[Ann.knnGraphLsh]] with `polySigns = true`: the
    * corpus self-join variant of [[lshTopkSql]] (seed base 3000, a ≠ b). */
  private def knnGraphLshSql(numTables: Int, numBits: Int, k: Int): String = {
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${lshBucketCte(3000, numTables, numBits)},
      cand AS (SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM buck qb JOIN buck cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
        WHERE qb.vec_id <> cb.vec_id),
      p AS (SELECT cand.query_id, cand.neighbor_id,
          ${sumSql("q.v[i] * c.v[i]")} AS dot,
          ${sumSql("q.v[i] * q.v[i]")} AS nq,
          ${sumSql("c.v[i] * c.v[i]")} AS nc
        FROM cand JOIN e q ON q.vec_id = cand.query_id
        JOIN e c ON c.vec_id = cand.neighbor_id),
      r AS (SELECT query_id, neighbor_id, dot / (sqrt(nq) * sqrt(nc)) AS cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id) AS rank
      FROM p)
      SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= $k
      ORDER BY query_id, rank"""
  }

  /** DuckDB replay of [[graft.operators.Dbscan.dbscanQuantized]]: identical
    * quantization, integer ε-test, HAVING-count core rule, recursive-CTE
    * min-label closure of the core-core subgraph (self-edges keep isolated
    * cores), min-cluster border assignment, −1 noise. Everything integer ⇒
    * hash-exact. Quadratic replay (pair join + closure) — check_big SKIPs
    * it like the other closure oracles.
    */
  private def dbscanSql(epsSq: Long, minPts: Int, scale: Long, dim: Int): String =
    s"""WITH RECURSIVE q AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings),
      nbr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM q a JOIN q b ON a.vec_id <> b.vec_id
        WHERE list_sum(list_transform(generate_series(1, $dim),
          i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) <= $epsSq),
      ${dbscanTailSql(minPts)}"""

  /** DuckDB replay of [[graft.operators.Dbscan.dbscanBanded]]: SRP banding
    * via the same LCG sign source as the other LSH oracles (seed base
    * 5000), candidate pairs = DISTINCT (table, bucket) collisions, then the
    * IDENTICAL quantized ε-verify and label tail as [[dbscanSql]] — the
    * banding itself is part of the oracle contract, not just the labels.
    */
  private def dbscanLshSql(epsSq: Long, minPts: Int, scale: Long, dim: Int,
      numTables: Int, numBits: Int): String =
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
      qz AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings),
      ${lshBucketCte(5000, numTables, numBits)},
      cand AS (SELECT DISTINCT ab.vec_id AS id_a, bb.vec_id AS id_b
        FROM buck ab JOIN buck bb ON ab.tbl = bb.tbl AND ab.bucket = bb.bucket
        WHERE ab.vec_id <> bb.vec_id),
      nbr AS (SELECT c.id_a, c.id_b
        FROM cand c JOIN qz a ON a.vec_id = c.id_a JOIN qz b ON b.vec_id = c.id_b
        WHERE list_sum(list_transform(generate_series(1, $dim),
          i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) <= $epsSq),
      ${dbscanTailSql(minPts)}"""

  /** The label tail shared by [[dbscanSql]] and [[dbscanLshSql]]: HAVING-count
    * core rule, recursive-CTE min-label closure of the core-core subgraph
    * (self-edges keep isolated cores), min-cluster border assignment, −1
    * noise. Everything integer ⇒ hash-exact. Quadratic replay (pair join +
    * closure) — check_big SKIPs it like the other closure oracles.
    */
  private def dbscanTailSql(minPts: Int): String =
    s"""core AS (SELECT id_a AS cid FROM nbr GROUP BY id_a
        HAVING count(*) >= $minPts),
      ce AS (SELECT n.id_a, n.id_b FROM nbr n
        JOIN core c1 ON n.id_a = c1.cid JOIN core c2 ON n.id_b = c2.cid),
      edges AS (SELECT id_a AS src, id_b AS dst FROM ce
                UNION SELECT cid, cid FROM core),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS cid, min(dst) AS component_id FROM reach GROUP BY src),
      border AS (SELECT n.id_a AS vec_id, min(c.component_id) AS cluster
        FROM nbr n JOIN core cb ON n.id_b = cb.cid
        JOIN comp c ON c.cid = n.id_b
        WHERE n.id_a NOT IN (SELECT cid FROM core)
        GROUP BY n.id_a)
      SELECT e.vec_id, coalesce(cm.component_id, b.cluster, -1) AS cluster,
        (cm.cid IS NOT NULL) AS is_core
      FROM embeddings e LEFT JOIN comp cm ON cm.cid = e.vec_id
      LEFT JOIN border b ON b.vec_id = e.vec_id
      ORDER BY e.vec_id"""

  /** DuckDB replay of [[Ann.lshMultiProbeTopK]] with `polySigns = true`:
    * candidate side = one LCG bucket per (vector, table); query side = the
    * base bucket plus every single-bit xor flip (DuckDB `xor`), then the
    * same collision join + DISTINCT + exact cosine top-k. */
  private def lshMultiProbeSql(numTables: Int, numBits: Int, k: Int): String = {
    val masks = 0 +: (0 until numBits).map(1 << _)
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${lshBucketCte(1000, numTables, numBits)},
      probes AS (SELECT b.vec_id, b.tbl, xor(b.bucket, m.m) AS bucket
        FROM buck b CROSS JOIN
          (SELECT unnest(ARRAY[${masks.mkString(",")}]) AS m) m
        WHERE b.vec_id < 10),
      cand AS (SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM probes qb JOIN buck cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
        WHERE cb.vec_id >= 10),
      p AS (SELECT cand.query_id, cand.neighbor_id,
          ${sumSql("q.v[i] * c.v[i]")} AS dot,
          ${sumSql("q.v[i] * q.v[i]")} AS nq,
          ${sumSql("c.v[i] * c.v[i]")} AS nc
        FROM cand JOIN e q ON q.vec_id = cand.query_id
        JOIN e c ON c.vec_id = cand.neighbor_id),
      r AS (SELECT query_id, neighbor_id, dot / (sqrt(nq) * sqrt(nc)) AS cosine,
        row_number() OVER (PARTITION BY query_id
          ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id) AS rank
      FROM p)
      SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= $k
      ORDER BY query_id, rank"""
  }

  /** DuckDB replay of [[Ann.lshPairs]] with `polySigns = true` (seed base
    * 2000): banded candidate pairs, exact-cosine >= tau verification. */
  private def lshPairsSql(numTables: Int, numBits: Int, minCosine: Double): String = {
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${lshBucketCte(2000, numTables, numBits)},
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buck a JOIN buck b ON a.tbl = b.tbl AND a.bucket = b.bucket
        WHERE a.vec_id < b.vec_id),
      p AS (SELECT cand.id_a, cand.id_b,
          ${sumSql("q.v[i] * c.v[i]")} AS dot,
          ${sumSql("q.v[i] * q.v[i]")} AS nq,
          ${sumSql("c.v[i] * c.v[i]")} AS nc
        FROM cand JOIN e q ON q.vec_id = cand.id_a
        JOIN e c ON c.vec_id = cand.id_b)
      SELECT id_a, id_b, dot / (sqrt(nq) * sqrt(nc)) AS cosine FROM p
      WHERE dot / (sqrt(nq) * sqrt(nc)) >= $minCosine
      ORDER BY id_a, id_b"""
  }

  /** Unrolled DuckDB replay of [[Ann.semanticDedupQuantized]]: the
    * kmeans_embeddings quantized-Lloyd CTE chain (assignment argmin +
    * truncating integer means per iteration), then within-cluster pairs
    * admitted by the division-free HUGEINT cosine test, a recursive-CTE
    * min-label closure (the dedup_groups pattern), and the survivor
    * anti-join. Everything integer ⇒ hash-exact vs the engine.
    */
  /** Argmin-assignment CTE over the quantized set `q` against centroid CTE
    * `cents` — the shared step of every unrolled-Lloyd oracle here. */
  private def lloydAssignCte(name: String, cents: String, dim: Int): String =
    s"""$name AS (SELECT vec_id, cl FROM (
        SELECT q.vec_id, c.cl,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            list_sum(list_transform(generate_series(1, $dim),
              i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))), c.cl) AS rn
        FROM q CROSS JOIN $cents c) WHERE rn = 1)"""

  /** The unrolled [[graft.operators.KMeans.lloydQuantized]] CTE chain over
    * `where`-filtered embeddings: emits CTEs `q` (quantized training set),
    * `dims`, `c0`…`c<iters>` (codebook per iteration — truncating integer
    * means, empty clusters keep the previous centroid) and `fin(vec_id,
    * cl)` (the final assignment). Callers prepend `WITH [RECURSIVE]` and
    * append their tail. Shared by semantic_dedup and ann_ivf so dependent
    * oracles replay the EXACT training chain, never a paraphrase. */
  private def lloydChainCtes(k: Int, iters: Int, scale: Long, dim: Int,
      where: String = ""): String = {
    val head = s"""q AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings$where),
      dims AS (SELECT unnest(generate_series(1, $dim)) AS i),
      c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, v
        FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT $k))"""
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""${lloydAssignCte(s"a$t", s"c$p", dim)},
        m$t AS (SELECT a.cl, d.i, CAST(sum(q.v[d.i]) AS BIGINT) // count(*) AS m
          FROM a$t a JOIN q ON a.vec_id = q.vec_id CROSS JOIN dims d
          GROUP BY a.cl, d.i),
        c$t AS (SELECT p.cl, coalesce(mm.v, p.v) AS v
          FROM c$p p LEFT JOIN
            (SELECT cl, list(m ORDER BY i) AS v FROM m$t GROUP BY cl) mm
            ON p.cl = mm.cl)"""
    }
    ((head +: steps) :+ lloydAssignCte("fin", s"c$iters", dim))
      .mkString(",\n      ")
  }

  private def semanticDedupQuantizedSql(k: Int, iters: Int, scale: Long,
      dim: Int, tauNumSq: Long, tauDenSq: Long): String = {
    val tail = s"""
      pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          CAST(list_sum(list_transform(generate_series(1, $dim),
            i -> qa.v[i] * qb.v[i])) AS HUGEINT) AS dot,
          CAST(list_sum(list_transform(generate_series(1, $dim),
            i -> qa.v[i] * qa.v[i])) AS HUGEINT) AS na2,
          CAST(list_sum(list_transform(generate_series(1, $dim),
            i -> qb.v[i] * qb.v[i])) AS HUGEINT) AS nb2
        FROM fin a JOIN fin b ON a.cl = b.cl AND a.vec_id < b.vec_id
        JOIN q qa ON qa.vec_id = a.vec_id JOIN q qb ON qb.vec_id = b.vec_id),
      adm AS (SELECT id_a, id_b FROM pr
        WHERE dot > 0 AND dot * dot * $tauDenSq >= $tauNumSq * na2 * nb2),
      edges AS (SELECT id_a AS src, id_b AS dst FROM adm
                UNION SELECT id_b, id_a FROM adm),
      reach(src, dst) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS vec_id, min(dst) AS component_id FROM reach GROUP BY src),
      dropped AS (SELECT vec_id FROM comp WHERE vec_id <> component_id)
      SELECT f.vec_id, f.cl AS cluster FROM fin f
      WHERE f.vec_id NOT IN (SELECT vec_id FROM dropped)
      ORDER BY f.vec_id"""
    s"WITH RECURSIVE ${lloydChainCtes(k, iters, scale, dim)},\n      $tail"
  }

  /** Unrolled DuckDB replay of [[Ann.ivfTopKQuantized]]: the quantized-Lloyd
    * training chain over the CANDIDATE set (vec_id >= 10) verbatim via
    * [[lloydChainCtes]], query probes = nprobe integer-L2²-nearest final
    * centroids (ties toward the lower cell), within-cell ranking = integer
    * L2² ascending with a neighbor_id tiebreak. Training, routing, and
    * ranking are all BIGINT ⇒ hash-exact.
    */
  private def ivfQuantizedSql(k: Int, nprobe: Int, kCells: Int, iters: Int,
      scale: Long, dim: Int): String = {
    val l2 = (a: String, b: String) =>
      s"""list_sum(list_transform(generate_series(1, $dim),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"""
    s"""WITH ${lloydChainCtes(kCells, iters, scale, dim, " WHERE vec_id >= 10")},
      qq AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id < 10),
      probes AS (SELECT vec_id AS query_id, cl AS cell FROM (
        SELECT qq.vec_id, c.cl,
          row_number() OVER (PARTITION BY qq.vec_id ORDER BY
            ${l2("qq.v", "c.v")}, c.cl) AS rn
        FROM qq CROSS JOIN c$iters c) WHERE rn <= $nprobe),
      scored AS (SELECT p.query_id, f.vec_id AS neighbor_id,
          CAST(${l2("a.v", "b.v")} AS BIGINT) AS d2
        FROM probes p JOIN fin f ON f.cl = p.cell
        JOIN qq a ON a.vec_id = p.query_id
        JOIN q b ON b.vec_id = f.vec_id),
      r AS (SELECT query_id, neighbor_id, d2,
        row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
      FROM scored)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
      FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** Unrolled DuckDB replay of [[Pq.ivfPqQuantized]]: the JOINT Lloyd over
    * the candidate set — per vector, m subspace slices (j = 0..m−1) PLUS the
    * whole vector (j = m, the IVF coarse geometry) — unrolls as one
    * j-indexed codebook CTE chain (argmin assignment with (dist, cl)
    * tie-break, truncating integer means `//`, empty clusters keep the
    * previous centroid). Then: PQ codes + coarse cell = the final book's own
    * argmin; query probes = nprobe L2²-nearest coarse cells; ADC = the
    * per-(query, subspace, code) integer L2² lookup table joined against the
    * codes and SUMMED; shortlist = (adist, neighbor_id) rank ≤ topK·rerank;
    * re-rank = exact integer L2² over the full quantized vectors. Every
    * stage BIGINT ⇒ hash-exact vs the engine.
    */
  private def ivfPqQuantizedSql(m: Int, k: Int, iters: Int, topK: Int,
      coarseK: Int, nprobe: Int, rerank: Int, scale: Long, dim: Int): String = {
    val subDim = dim / m
    val l2 = (a: String, b: String, n: String) =>
      s"""list_sum(list_transform(generate_series(1, $n),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"""
    def assign(name: String, cents: String) =
      s"""$name AS (SELECT vec_id, j, cl FROM (
          SELECT s.vec_id, s.j, c.cl,
            row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY
              ${l2("s.sv", "c.v", "len(s.sv)")}, c.cl) AS rn
          FROM sub s JOIN $cents c ON c.j = s.j) WHERE rn = 1)"""
    val head = s"""q AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id >= 10),
      qq AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id < 10),
      js AS (SELECT unnest(generate_series(0, $m)) AS j),
      sub AS (SELECT q.vec_id, js.j,
          CASE WHEN js.j = $m THEN q.v
            ELSE q.v[(js.j*$subDim+1):((js.j+1)*$subDim)] END AS sv
        FROM q CROSS JOIN js),
      seed AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, v
        FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT ${math.max(k, coarseK)})),
      c0 AS (SELECT js.j, s.cl,
          CASE WHEN js.j = $m THEN s.v
            ELSE s.v[(js.j*$subDim+1):((js.j+1)*$subDim)] END AS v
        FROM seed s CROSS JOIN js
        WHERE (js.j < $m AND s.cl < $k) OR (js.j = $m AND s.cl < $coarseK))"""
    val steps = (1 to iters).map { t =>
      val p = t - 1
      s"""${assign(s"a$t", s"c$p")},
        m$t AS (SELECT s.j, a.cl, d.i, CAST(sum(s.sv[d.i]) AS BIGINT) // count(*) AS m
          FROM a$t a JOIN sub s ON s.vec_id = a.vec_id AND s.j = a.j
          JOIN (SELECT unnest(generate_series(1, $dim)) AS i) d ON d.i <= len(s.sv)
          GROUP BY s.j, a.cl, d.i),
        c$t AS (SELECT p.j, p.cl, coalesce(mm.v, p.v) AS v
          FROM c$p p LEFT JOIN
            (SELECT j, cl, list(m ORDER BY i) AS v FROM m$t GROUP BY j, cl) mm
            ON p.j = mm.j AND p.cl = mm.cl)"""
    }
    val tail = s"""${assign("fin", s"c$iters")},
      cells AS (SELECT vec_id, cl AS cell FROM fin WHERE j = $m),
      pqc AS (SELECT vec_id, j, cl AS code FROM fin WHERE j < $m),
      probes AS (SELECT vec_id AS query_id, cl AS cell FROM (
          SELECT qq.vec_id, c.cl,
            row_number() OVER (PARTITION BY qq.vec_id ORDER BY
              ${l2("qq.v", "c.v", s"$dim")}, c.cl) AS rn
          FROM qq JOIN c$iters c ON c.j = $m) WHERE rn <= $nprobe),
      qsub AS (SELECT qq.vec_id, js.j,
          qq.v[(js.j*$subDim+1):((js.j+1)*$subDim)] AS sv
        FROM qq CROSS JOIN js WHERE js.j < $m),
      lut AS (SELECT qs.vec_id AS query_id, qs.j, c.cl AS code,
          CAST(${l2("qs.sv", "c.v", s"$subDim")} AS BIGINT) AS d
        FROM qsub qs JOIN c$iters c ON c.j = qs.j),
      ad AS (SELECT p.query_id, ce.vec_id AS neighbor_id,
          CAST(sum(l.d) AS BIGINT) AS adist
        FROM probes p JOIN cells ce ON ce.cell = p.cell
        JOIN pqc pc ON pc.vec_id = ce.vec_id
        JOIN lut l ON l.query_id = p.query_id AND l.j = pc.j AND l.code = pc.code
        GROUP BY 1, 2),
      sl AS (SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adist, neighbor_id) AS srank
        FROM ad),
      rr AS (SELECT s.query_id, s.neighbor_id,
          CAST(${l2("a.v", "b.v", s"$dim")} AS BIGINT) AS d2
        FROM sl s JOIN qq a ON a.vec_id = s.query_id
        JOIN q b ON b.vec_id = s.neighbor_id
        WHERE s.srank <= ${topK * rerank}),
      r AS (SELECT query_id, neighbor_id, d2,
        row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
      FROM rr)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, d2
      FROM r WHERE rank <= $topK ORDER BY query_id, rank"""
    ((head +: steps) :+ tail).mkString("WITH ", ",\n      ", "")
  }

  /** DuckDB replay of [[Sq8.topKQuantized]]: e3-quantized vectors, integer
    * max-abs int8 codes (`(v_i·127) // mx` — `//` truncates toward zero on
    * negatives exactly like Spark's DIV, probed), int8 MAC scan, signed
    * sqrt-free square priority, (p DESC, id) shortlist of k·rerank, exact
    * signed-square integer cosine re-rank. Every stage BIGINT (HUGEINT
    * intermediates CAST back) ⇒ hash-exact.
    */
  private def sq8QuantizedSql(k: Int, rerank: Int, scale: Long, dim: Int): String = {
    val dotOf = (a: String, b: String) =>
      s"CAST(list_sum(list_transform(generate_series(1, $dim), i -> $a[i] * $b[i])) AS HUGEINT)"
    s"""WITH q0 AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings),
      q1 AS (SELECT vec_id, v,
        greatest(list_max(list_transform(v, x -> abs(x))), 1) AS mx,
        CAST(list_sum(list_transform(v, x -> x * x)) AS HUGEINT) AS n2
      FROM q0),
      q2 AS (SELECT vec_id, v, mx, n2,
        list_transform(v, x -> (x * 127) // mx) AS c
      FROM q1),
      qq AS (SELECT * FROM q2 WHERE vec_id < 10),
      cand AS (SELECT * FROM q2 WHERE vec_id >= 10),
      scan AS (SELECT q.vec_id AS query_id, ca.vec_id AS neighbor_id,
          ${dotOf("q.c", "ca.c")} AS dot, ca.mx AS cmx, ca.n2 AS cn2
        FROM qq q CROSS JOIN cand ca),
      pri AS (SELECT query_id, neighbor_id,
          CAST(CASE WHEN dot >= 0 THEN 1 WHEN dot < 0 THEN -1 END
            * ((dot * dot * cmx * cmx * 1000000) // cn2) AS BIGINT) AS p
        FROM scan),
      sl AS (SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY p DESC, neighbor_id) AS srank
        FROM pri),
      rr AS (SELECT s.query_id, s.neighbor_id,
          ${dotOf("q.v", "ca.v")} AS dq, q.n2 AS qn2, ca.n2 AS cn2
        FROM sl s JOIN qq q ON q.vec_id = s.query_id
        JOIN cand ca ON ca.vec_id = s.neighbor_id
        WHERE s.srank <= ${k * rerank}),
      fin AS (SELECT query_id, neighbor_id,
          CAST(CASE WHEN dq >= 0 THEN 1 WHEN dq < 0 THEN -1 END
            * ((dq * dq * 1000000000000) // (qn2 * cn2)) AS BIGINT) AS cos2_e12
        FROM rr),
      r AS (SELECT query_id, neighbor_id, cos2_e12,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos2_e12 DESC, neighbor_id) AS rank
      FROM fin)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos2_e12
      FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

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
        // FULL ORACLE since r9: the LCG (poly) sign source makes the bucket
        // assignment plain BIGINT arithmetic, so the DuckDB replay computes
        // the exact same buckets, candidate set, and cosine ranking — the
        // recall-floor spec (AnnSpec) remains as the quality audit, and the
        // oracle is a STANDING banding audit (any drift in bucketing,
        // collision join, or dedup surfaces as a hash mismatch).
        Ann.lshTopK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
          k = 5, numTables = 8, numBits = 4, polySigns = true)
      },
      Some(lshTopkSql(numTables = 8, numBits = 4, k = 5)),
      "Sign-random-projection LSH ANN (8 tables × 4 bits, SQL-replayable LCG " +
        "hyperplane signs), candidates = bucket collisions only — exact oracle " +
        "over buckets + collision join + cosine re-rank."),

    "ann_lsh_multiprobe" -> Q(
      // FULL ORACLE since r9 (the ann_lsh LCG promotion + DuckDB xor() for
      // the Hamming-1 probe masks); the same-budget-recall spec stays
      (s, d) => {
        val e = emb(s, d)
        Ann.lshMultiProbeTopK(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
          k = 5, numTables = 4, numBits = 4, polySigns = true)
      },
      Some(lshMultiProbeSql(numTables = 4, numBits = 4, k = 5)),
      "Multi-probe LSH ANN: each query also probes the Hamming-1 buckets, so " +
        "recall rises without more tables — probe fan-out multiplies only the " +
        "broadcast query side, never the corpus index; SQL-replayable LCG signs."),

    "dedup_embedding_lsh" -> Q(
      // FULL ORACLE since r9 (LCG banding replay); recall-vs-exact stays
      // spec-bounded in AnnSpec — the oracle pins the band+verify OUTPUT
      (s, d) => Ann.lshPairs(emb(s, d), 0.45, polySigns = true),
      Some(lshPairsSql(numTables = 8, numBits = 4, minCosine = 0.45)),
      "SRP-banded embedding near-dup pairs with exact-cosine verification " +
        "(scale path for dedup_embedding); SQL-replayable LCG banding."),

    "semantic_dedup" -> Q(
      // ORACLE-CHECKED since r8 via the quantized-integer discipline that
      // kmeans_embeddings proved: quantized Lloyd clustering + division-free
      // integer cosine admission (dot² · 10⁴ ≥ 2025 · ‖a‖²‖b‖² ⇔ cos ≥ 0.45)
      // + min-label components, bit-exact vs the unrolled recursive-CTE
      // replay. The float semanticDedup (SRP hot-cluster sub-split) remains
      // the production path, spec-backed in AnnSpec.
      (s, d) => Ann.semanticDedupQuantized(emb(s, d),
        tauNumSq = 2025L, tauDenSq = 10000L, k = 8, iters = 3),
      Some(semanticDedupQuantizedSql(k = 8, iters = 3, scale = 1000L, dim = 64,
        tauNumSq = 2025L, tauDenSq = 10000L)),
      "SemDeDup: quantized-integer k-means clustering, within-cluster integer " +
        "cosine >= 0.45 pairs, connected-component collapse, keep min id per " +
        "group — bit-exact vs the unrolled SQL replay."),

    "ann_ivf" -> Q(
      // FULL ORACLE since r10 via the quantized-integer discipline: the
      // registered entry routes codebook training (lloydQuantized over the
      // candidate set), cell assignment, query probing, AND within-cell
      // ranking (integer L2², neighbor_id tiebreak) through BIGINT
      // arithmetic, bit-exact vs the unrolled-Lloyd + cell-routing SQL
      // replay. The float ivfTopK (cosine ranking, label-mean codebook)
      // stays the production path, recall-spec-backed in AnnSpec.
      (s, d) => {
        val e = emb(s, d)
        Ann.ivfTopKQuantized(e.filter(col("vec_id") < 10),
          e.filter(col("vec_id") >= 10), k = 5, nprobe = 2, kCells = 8, iters = 3)
      },
      Some(ivfQuantizedSql(k = 5, nprobe = 2, kCells = 8, iters = 3,
        scale = 1000L, dim = 64)),
      "IVF ANN, integer-exact twin: quantized-Lloyd codebook over the " +
        "candidates, probe 2 nearest cells by integer L2², rank within " +
        "probed cells by integer L2² — the whole train+route+rank chain " +
        "replays as unrolled SQL."),

    "ann_ivf_pq" -> Q(
      // FULL ORACLE since r12 via the integer-quantized twin (the ann_ivf
      // r10 / ann_sq8 r11 playbook, closing the similarity family's last
      // rows-only row): e3 quantization, the SAME joint one-shuffle-per-
      // iteration Lloyd as the float path (all 8 PQ books + the coarse
      // geometry together) with truncating integer means, integer ADC
      // lookup tables, integer L2² routing and re-rank — bit-exact vs the
      // unrolled j-indexed codebook SQL replay. The float Pq.ivfPq (cosine
      // output, normalized training) stays the production path,
      // recall-spec-backed in PqSpec.
      (s, d) => {
        val e = emb(s, d)
        Pq.ivfPqQuantized(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
          m = 8, k = 16, iters = 3, topK = 5, nprobe = 4)
      },
      Some(ivfPqQuantizedSql(m = 8, k = 16, iters = 3, topK = 5, coarseK = 8,
        nprobe = 4, rerank = 10, scale = 1000L, dim = 64)),
      "IVF-PQ ANN (IVFADC+R), integer-exact twin: 8×16 product-quantization " +
        "codes (~30× smaller than raw floats — what fits a 100 TB corpus in " +
        "memory), joint quantized Lloyd (PQ books + coarse quantizer, one " +
        "shuffle/iteration), integer ADC lookup tables, IVF routing, exact " +
        "integer re-rank of the shortlist only — the whole chain replays as " +
        "unrolled SQL."),

    "ann_sq8" -> Q(
      // FULL ORACLE since r11 via the integer-exact twin (the ann_ivf r10 /
      // ann_lsh r9 playbook): integer max-abs int8 codes, integer MAC scan,
      // sqrt-free signed-square priority shortlist (TopKPairs, no window),
      // exact signed-square integer cosine re-rank — bit-exact vs the SQL
      // replay. The float Sq8.topK (true cosine output) stays the
      // production path, recall-spec-backed in AnnSpec.
      (s, d) => {
        val e = emb(s, d)
        Sq8.topKQuantized(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5)
      },
      Some(sq8QuantizedSql(k = 5, rerank = 4, scale = 1000L, dim = 64)),
      "SQ8 ANN, integer-exact twin: int8 max-abs scalar quantization (4x " +
        "smaller vectors), integer multiply-accumulate scan, bounded-state " +
        "per-query shortlist (TopKPairs, no window), integer cosine re-rank " +
        "of the shortlist only — the whole chain replays as SQL."),

    "knn_graph" -> Q(
      (s, d) => Ann.knnGraphExact(emb(s, d), k = 3),
      Some(knnGraphSql),
      "Exact corpus kNN graph: top-3 cosine neighbors of EVERY vector (self " +
        "excluded) — O(N²) oracle baseline; knn_graph_lsh is the scale path."),

    "knn_graph_lsh" -> Q(
      // FULL ORACLE since r9 (same LCG-sign promotion as ann_lsh): the
      // banding itself is now driver-audited, the AnnSpec edge-recall floor
      // vs knn_graph remains as the quality audit
      (s, d) => Ann.knnGraphLsh(emb(s, d), k = 3, polySigns = true),
      Some(knnGraphLshSql(numTables = 8, numBits = 4, k = 3)),
      "Banded kNN graph: each node ranks only its SRP bucket collisions — " +
        "one (table,bucket) shuffle instead of the N² cross join; " +
        "SQL-replayable LCG signs make the banding a standing oracle."),

    "dbscan_embeddings" -> Q(
      // eps² = 1.3e6 quantized units ≈ the 0.1-1% pair-distance quantile of
      // this corpus; minPts = 3 → ~10% core points, several multi-point
      // density clusters, real border points AND real noise — the regime
      // DBSCAN exists for
      (s, d) => graft.operators.Dbscan.dbscanQuantized(emb(s, d),
        epsSq = 1300000L, minPts = 3),
      Some(dbscanSql(epsSq = 1300000L, minPts = 3, scale = 1000L, dim = 64)),
      "DBSCAN density clustering (quantized-integer ε-test, min-label core " +
        "components, canonical min-cluster border assignment, noise = -1) — " +
        "the non-centroidal companion to kmeans_embeddings."),

    "dbscan_embeddings_lsh" -> Q(
      // same ε/minPts regime as dbscan_embeddings; candidates pruned to SRP
      // bucket collisions — the 100 TB path, with the banding itself inside
      // the oracle contract (LCG signs replayed in SQL, seed base 5000)
      (s, d) => graft.operators.Dbscan.dbscanBanded(emb(s, d),
        epsSq = 1300000L, minPts = 3),
      Some(dbscanLshSql(epsSq = 1300000L, minPts = 3, scale = 1000L, dim = 64,
        numTables = 8, numBits = 4)),
      "SRP-banded DBSCAN: the dbscan_embeddings scale path — ε-pairs meet " +
        "only inside an LSH (table,bucket) collision, exact integer ε-verify " +
        "on survivors, identical core/border/noise rules; one (table,bucket) " +
        "shuffle instead of the N² cross join."),

    "triplet_mining" -> Q(
      (s, d) => {
        import s.implicits._
        // HARD-NEGATIVE TRIPLET MINING — the contrastive-training curation
        // step after sampling (contrastive_negative_sampling draws RANDOM
        // negatives; metric learning wants the HARDEST): per anchor, the
        // nearest SAME-label vector (positive) and the nearest
        // DIFFERENT-label vector (hard negative), plus the margin. Ranking
        // is the integer signed-square cosine (sign(dot)·dot²·10¹² div
        // ‖a‖²‖b‖² — monotone in cosine across the sign boundary, the
        // ann_sq8 discipline), so the whole mine replays hash-exact. This
        // is the declared O(N²) exact baseline (one pair shuffle); the
        // banded kNN graph (knn_graph_lsh) is the scale path for the
        // candidate generation.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val q = emb(s, d).select($"vec_id",
          transform($"embedding".cast("array<double>"),
            x => floor(x * 1000 + 0.5).cast("long")).as("v"), $"label")
          .withColumn("n2", aggregate(transform($"v", x => x * x),
            lit(0L), (acc, x) => acc + x))
        val a = q.select($"vec_id".as("anchor_id"), $"v".as("va"),
          $"label".as("la"), $"n2".as("na"))
        val b = q.select($"vec_id".as("cand_id"), $"v".as("vb"),
          $"label".as("lb"), $"n2".as("nb"))
        val dot = aggregate(zip_with($"va", $"vb", (x, y) => x * y),
          lit(0L), (acc, t) => acc + t)
        val scored = a.join(b, $"anchor_id" =!= $"cand_id")
          .withColumn("s",
            signum(dot).cast("long") *
              idiv(dot.cast(d38) * dot.cast(d38) * lit(1000000000000L).cast(d38),
                $"na".cast(d38) * $"nb".cast(d38)).cast("long"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"anchor_id", $"same").orderBy($"s".desc, $"cand_id")
        val ranked = scored.withColumn("same", $"la" === $"lb")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
        val pos = ranked.filter($"same")
          .select($"anchor_id", $"cand_id".as("pos_id"), $"s".as("pos_s"))
        val neg = ranked.filter(!$"same")
          .select($"anchor_id", $"cand_id".as("neg_id"), $"s".as("neg_s"))
        pos.join(neg, "anchor_id")
          .select($"anchor_id", $"pos_id", $"pos_s", $"neg_id", $"neg_s",
            ($"pos_s" - $"neg_s").as("margin"))
          .orderBy($"anchor_id")
      },
      Some("""WITH q AS (SELECT vec_id, label,
            list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
          FROM embeddings),
        qn AS (SELECT vec_id, label, v,
            CAST(list_sum(list_transform(v, x -> x * x)) AS HUGEINT) AS n2
          FROM q),
        p AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
            a.label = b.label AS same,
            CAST(list_sum(list_transform(generate_series(1, 64),
              i -> a.v[i] * b.v[i])) AS HUGEINT) AS dot,
            a.n2 AS na, b.n2 AS nb
          FROM qn a JOIN qn b ON a.vec_id <> b.vec_id),
        sc AS (SELECT anchor_id, cand_id, same,
            CAST(CASE WHEN dot >= 0 THEN 1 WHEN dot < 0 THEN -1 END
              * ((dot * dot * 1000000000000) // (na * nb)) AS BIGINT) AS s
          FROM p),
        r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id, same
            ORDER BY s DESC, cand_id) AS rn FROM sc)
        SELECT pos.anchor_id, pos.cand_id AS pos_id, pos.s AS pos_s,
          neg.cand_id AS neg_id, neg.s AS neg_s,
          CAST(pos.s - neg.s AS BIGINT) AS margin
        FROM (SELECT * FROM r WHERE same AND rn = 1) pos
        JOIN (SELECT * FROM r WHERE NOT same AND rn = 1) neg USING (anchor_id)
        ORDER BY anchor_id"""),
      "Hard-negative triplet mining (nearest same-label positive, nearest " +
        "different-label negative, margin) via the integer signed-square " +
        "cosine — the exact O(N²) baseline; the banded kNN graph is the " +
        "candidate-generation scale path."),

    "hybrid_retrieval_rrf" -> Q(
      (s, d) => {
        import s.implicits._
        // Hybrid lexical+vector retrieval fused by reciprocal-rank fusion
        // (RRF, Cormack et al.): score(d) = Σ 1/(60 + rank_i(d)) over the two
        // systems — the standard RAG-stack retrieval composite. Each system
        // produces a BOUNDED top-50 list (lexical: the ranked_retrieval
        // tf×idf pipeline, TakeOrderedAndProject; vector: broadcast-query
        // brute-force cosine), so the rank windows and the full-outer fuse
        // run on ≤50 rows each — fusion cost is O(listSize), independent of
        // corpus size, which is what makes RRF the scalable fusion: only the
        // per-system retrieval touches the corpus. Ranks are integers and
        // both engines compute the identical 1/(60+r) doubles, so the fused
        // scores hash-match exactly.
        val doc = table(s, d, "documents")
        val terms = Seq("vector", "join", "scan")
        val toks = doc.select($"doc_id",
          explode(graft.functions.ascii_tokens(col("text"))).as("tok"))
        val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
        val qtoks = toks.filter($"tok".isin(terms: _*))
        val dfT = qtoks.select($"doc_id", $"tok").distinct()
          .groupBy($"tok").agg(count(lit(1)).as("df"))
        val n = doc.agg(count(lit(1)).as("n_docs"))
        val textTop = qtoks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
          .join(broadcast(dfT), "tok")
          .crossJoin(broadcast(n))
          .withColumn("w", expr("(n_docs * 1000000) div df"))
          .groupBy($"doc_id").agg(sum($"tf" * $"w").as("score_num"))
          .join(dl, "doc_id")
          .withColumn("ts", $"score_num".cast("double") / $"dl")
          .orderBy(desc("ts"), $"doc_id").limit(50)
        val wT = org.apache.spark.sql.expressions.Window.orderBy(desc("ts"), $"doc_id")
        val textRank = textTop // ≤50 rows: the unpartitioned window is bounded
          .withColumn("rank_text", row_number().over(wT).cast("long"))
          .select($"doc_id", $"rank_text")
        val e = emb(s, d)
        val vecRank = Ann.bruteForceTopK(
            e.filter($"vec_id" === 0), e.filter($"vec_id" =!= 0), k = 50)
          .select($"neighbor_id".as("doc_id"), $"rank".as("rank_vec"))
        textRank.join(vecRank, Seq("doc_id"), "full_outer")
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60) + $"rank_text"), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + $"rank_vec"), lit(0.0)))
          .orderBy(desc("rrf"), $"doc_id").limit(20)
          .select($"doc_id", $"rank_text", $"rank_vec", $"rrf")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
            FROM documents),
          dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
          qt AS (SELECT * FROM toks WHERE tok IN ('vector', 'join', 'scan')),
          dft AS (SELECT tok, count(DISTINCT doc_id) AS df FROM qt GROUP BY tok),
          n AS (SELECT count(*) AS n_docs FROM documents),
          tf AS (SELECT doc_id, tok, count(*) AS tf FROM qt GROUP BY doc_id, tok),
          sc AS (SELECT doc_id, CAST(sum(tf * ((n_docs * 1000000) // df)) AS BIGINT) AS score_num
            FROM tf JOIN dft USING (tok) CROSS JOIN n GROUP BY doc_id),
          ts AS (SELECT sc.doc_id, CAST(score_num AS DOUBLE) / dl AS ts
            FROM sc JOIN dl USING (doc_id)),
          tr AS (SELECT doc_id, rank_text FROM (SELECT doc_id,
              row_number() OVER (ORDER BY ts DESC, doc_id) AS rank_text FROM ts)
            WHERE rank_text <= 50),
          e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          p AS (SELECT c.vec_id AS doc_id,
              ${sumSql("q.v[i] * c.v[i]")} AS dot,
              ${sumSql("q.v[i] * q.v[i]")} AS nq,
              ${sumSql("c.v[i] * c.v[i]")} AS nc
            FROM e q, e c WHERE q.vec_id = 0 AND c.vec_id <> 0),
          vr AS (SELECT doc_id, rank_vec FROM (SELECT doc_id,
              row_number() OVER (ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, doc_id) AS rank_vec
              FROM p)
            WHERE rank_vec <= 50),
          fused AS (SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id, rank_text, rank_vec,
              coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_text), CAST(0.0 AS DOUBLE))
              + coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_vec), CAST(0.0 AS DOUBLE)) AS rrf
            FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id)
        SELECT doc_id, rank_text, rank_vec, rrf FROM fused
        ORDER BY rrf DESC, doc_id LIMIT 20"""),
      "Reciprocal-rank fusion of bounded top-50 lexical (tf x idf) and vector " +
        "(cosine) retrieval lists: fusion cost independent of corpus size, " +
        "integer ranks keep the fused doubles bit-exact."),

    "embedding_label_outliers" -> Q(
      (s, d) => {
        import s.implicits._
        // Mislabeled-example candidates: per label, the 5 vectors farthest
        // from their label's centroid — the label-noise audit every
        // classification corpus runs. Arithmetic is the kmeans_embeddings
        // discipline: embeddings quantized to integer 10⁻³ units
        // (floor(x·1000+0.5)), centroid = SIGN-SPLIT integer mean per dim
        // (sums of negatives floor≠trunc), distance = integer Σ(v−c)².
        // Shapes: one (label, dim) aggregate (O(labels·64) — broadcast),
        // join back on (label, dim), one vec aggregate, then a per-LABEL
        // top-5 window (partitioned — never global).
        val q = emb(s, d).select($"vec_id", $"label".cast("long").as("label"),
          posexplode(transform($"embedding".cast("array<double>"),
            x => floor(x * 1000 + 0.5).cast("long"))).as(Seq("dim", "v")))
        val c = q.groupBy($"label", $"dim")
          .agg(sum($"v").as("sv"), count(lit(1)).as("n"))
          .withColumn("cd", when($"sv" >= 0, idiv($"sv", $"n"))
            .otherwise(-idiv(-$"sv", $"n")))
          .select($"label", $"dim", $"cd")
        val dist = q.join(broadcast(c), Seq("label", "dim"))
          .groupBy($"vec_id", $"label")
          .agg(sum(($"v" - $"cd") * ($"v" - $"cd")).as("dist_sq"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"label").orderBy(desc("dist_sq"), $"vec_id")
        dist.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
          .select($"label", $"vec_id", $"dist_sq", $"rn".cast("long").as("rn"))
          .orderBy($"label", $"rn")
      },
      Some("""WITH q0 AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
            FROM embeddings),
          d AS (SELECT vec_id, label, unnest(qv) AS v,
              unnest(generate_series(0, len(qv) - 1)) AS dim FROM q0),
          c AS (SELECT label, dim,
              CASE WHEN sum(v) >= 0 THEN CAST(sum(v) AS BIGINT) // count(*)
                ELSE -(CAST(-sum(v) AS BIGINT) // count(*)) END AS cd
            FROM d GROUP BY 1, 2),
          dist AS (SELECT d.vec_id, d.label,
              CAST(sum((v - cd) * (v - cd)) AS BIGINT) AS dist_sq
            FROM d JOIN c ON d.label = c.label AND d.dim = c.dim
            GROUP BY 1, 2),
          r AS (SELECT label, vec_id, dist_sq,
              CAST(row_number() OVER (PARTITION BY label
                ORDER BY dist_sq DESC, vec_id) AS BIGINT) AS rn
            FROM dist)
        SELECT label, vec_id, dist_sq, rn FROM r WHERE rn <= 5
        ORDER BY label, rn"""),
      "Label-noise audit: per-label top-5 centroid outliers in quantized " +
        "integer arithmetic (sign-split centroid means, integer distances) " +
        "— broadcast centroids, partitioned top-k window."),

    "knn_classify" -> Q(
      (s, d) => knnVerdicts(s, d).orderBy(col("query_id")),
      Some(s"""$knnCteSql
        SELECT query_id, true_label, pred_label, votes, correct FROM v
        ORDER BY query_id"""),
      "Majority-vote k-NN classification over exact cosine top-5: broadcast " +
        "queries, one-pass struct-argmax vote, per-query verdict vs the " +
        "true label."),

    "classification_report" -> Q(
      (s, d) => {
        import s.implicits._
        // The eval summary over knn_classify's verdicts: per-label TP/FP/FN
        // with e6 precision/recall/F1. The label frame is the union of
        // truth and prediction labels (so a label that only ever appears as
        // a wrong prediction still reports precision 0); the three count
        // frames are O(labels) aggregates over the verdict table, the
        // joins all broadcast. greatest(·, 1) guards the 0/0 labels both
        // engines identically.
        val v = knnVerdicts(s, d)
        val labels = v.select($"true_label".as("label"))
          .unionByName(v.select($"pred_label".as("label"))).distinct()
        val tp = v.filter($"correct" === 1L)
          .groupBy($"true_label".as("label")).agg(count(lit(1)).as("tp"))
        val fp = v.filter($"correct" === 0L)
          .groupBy($"pred_label".as("label")).agg(count(lit(1)).as("fp"))
        val fn = v.filter($"correct" === 0L)
          .groupBy($"true_label".as("label")).agg(count(lit(1)).as("fn"))
        labels
          .join(tp, Seq("label"), "left").join(fp, Seq("label"), "left")
          .join(fn, Seq("label"), "left")
          .select($"label", coalesce($"tp", lit(0L)).as("tp"),
            coalesce($"fp", lit(0L)).as("fp"), coalesce($"fn", lit(0L)).as("fn"))
          .select($"label", $"tp", $"fp", $"fn",
            idiv(lit(1000000L) * $"tp", greatest($"tp" + $"fp", lit(1L))).as("precision_e6"),
            idiv(lit(1000000L) * $"tp", greatest($"tp" + $"fn", lit(1L))).as("recall_e6"),
            idiv(lit(2000000L) * $"tp",
              greatest(lit(2L) * $"tp" + $"fp" + $"fn", lit(1L))).as("f1_e6"))
          .orderBy($"label")
      },
      Some(s"""$knnCteSql,
        lbls AS (SELECT DISTINCT true_label AS label FROM v
          UNION SELECT DISTINCT pred_label FROM v),
        tp AS (SELECT true_label AS label, count(*) AS tp FROM v WHERE correct = 1 GROUP BY 1),
        fp AS (SELECT pred_label AS label, count(*) AS fp FROM v WHERE correct = 0 GROUP BY 1),
        fn AS (SELECT true_label AS label, count(*) AS fn FROM v WHERE correct = 0 GROUP BY 1),
        m AS (SELECT l.label, coalesce(tp.tp, 0) AS tp, coalesce(fp.fp, 0) AS fp,
            coalesce(fn.fn, 0) AS fn
          FROM lbls l LEFT JOIN tp ON l.label = tp.label
          LEFT JOIN fp ON l.label = fp.label LEFT JOIN fn ON l.label = fn.label)
        SELECT label, tp, fp, fn,
          (1000000 * tp) // greatest(tp + fp, 1) AS precision_e6,
          (1000000 * tp) // greatest(tp + fn, 1) AS recall_e6,
          (2000000 * tp) // greatest(2 * tp + fp + fn, 1) AS f1_e6
        FROM m ORDER BY label"""),
      "Per-label precision/recall/F1 over the k-NN verdicts: truth-union-" +
        "prediction label frame, O(labels) count aggregates, e6 metrics " +
        "with identical 0/0 guards on both engines."),

    "embedding_covariance" -> Q(
      (s, d) => {
        import s.implicits._
        // Exact integer covariance matrix of the first 16 embedding
        // dimensions — the sufficient-statistics block under PCA/whitening
        // (the power-iteration that follows is O(dim²) driver work; THIS is
        // the distributed part). Quantized units (floor(x·1000 + 0.5), the
        // kmeans/label-outliers discipline) keep every product integral:
        // cov_num(i,j) = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ in DECIMAL(38,0), emitted
        // upper-triangular. Shape: one posexplode + a vec_id-keyed
        // self-join (fan-out bounded by dims², not corpus), one (i,j)
        // aggregate.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val ex = emb(s, d)
          .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
          .filter($"dim" < 16)
          .select($"vec_id", $"dim".cast("long").as("dim"),
            floor($"x".cast("double") * 1000.0 + 0.5).cast("long").as("q"))
        ex.as("a").join(ex.as("b"),
            $"a.vec_id" === $"b.vec_id" && $"a.dim" <= $"b.dim")
          .groupBy($"a.dim".as("dim_i"), $"b.dim".as("dim_j"))
          .agg(count(lit(1)).as("n"),
            sum($"a.q").as("si"), sum($"b.q").as("sj"),
            sum($"a.q".cast(d38) * $"b.q".cast(d38)).as("sij"))
          .select($"dim_i", $"dim_j", $"n", {
            // the BIGINT narrowing fails LOUDLY past ~3e6 vectors (the
            // moneyE guard discipline): a silent non-ANSI NULL here would
            // skew against the oracle's raising HUGEINT→BIGINT cast
            val dec = $"n".cast(d38) * $"sij" - $"si".cast(d38) * $"sj".cast(d38)
            when(abs(dec) > lit(Long.MaxValue),
                raise_error(concat(lit("embedding_covariance: cov_num overflows BIGINT: "),
                  dec.cast("string"))))
              .otherwise(dec).cast("long").as("cov_num")
          })
          .orderBy($"dim_i", $"dim_j")
      },
      Some("""WITH ex AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
            CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS q
          FROM embeddings, unnest(generate_series(1, 16)) AS t(i)),
        p AS (SELECT a.dim AS dim_i, b.dim AS dim_j, count(*) AS n,
            CAST(sum(a.q) AS BIGINT) AS si, CAST(sum(b.q) AS BIGINT) AS sj,
            sum(CAST(a.q AS HUGEINT) * b.q) AS sij
          FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
          GROUP BY 1, 2)
        SELECT dim_i, dim_j, n,
          CAST(n * sij - CAST(si AS HUGEINT) * sj AS BIGINT) AS cov_num
        FROM p ORDER BY dim_i, dim_j"""),
      "Exact integer covariance of the first 16 embedding dims (quantized " +
        "units, n-scaled numerator in DECIMAL(38,0)): one posexplode + " +
        "vec-keyed self-join with dims-squared bounded fan-out — the " +
        "distributed sufficient-statistics block under PCA."),

    "embedding_random_projection" -> Q(
      (s, d) => {
        import s.implicits._
        // Johnson-Lindenstrauss RANDOM PROJECTION 64 → 16 dims (the cheap
        // dimension-reduction step upstream of ANN indexing / clustering at
        // 100 TB: O(n·d·k) map-side work, NO training pass — the contrast
        // to embedding_pca_power's data-dependent direction). The
        // projection matrix is a deterministic Achlioptas ±1 sign matrix
        // derived from an LCG on the (output dim, input dim) pair — SQL-
        // replayable, no RNG state anywhere — over the e6-quantized
        // embeddings (ann_ivf_pq's exactness discipline), so every output
        // coordinate is an exact BIGINT both engines agree on bit-for-bit.
        // The sign reads LCG BIT 20 (state DIV 2^20, then parity), NOT the
        // low bit: with an odd multiplier the low bit's parity depends only
        // on the input index i (j·64 is even), which would make every
        // output dimension identical — caught in the DuckDB pre-validation.
        // Long output form (vec_id, out dim, value): one explode of 16
        // per vector; the aggregate kernel is a codegen'd HOF fold —
        // embarrassingly parallel, zero shuffles before the output sort.
        val emb64 = emb(s, d).select($"vec_id",
          transform($"embedding",
            x => floor(x.cast("double") * 1e6 + 0.5).cast("long")).as("q"))
        emb64
          .withColumn("j", explode(sequence(lit(1L), lit(16L))))
          .withColumn("proj", expr(
            """aggregate(sequence(1L, 64L), 0L, (acc, i) ->
              acc + (CASE WHEN (((1103515245 * (j * 64 + i) + 12345) % 2147483648) DIV 1048576) % 2 = 0
                     THEN 1 ELSE -1 END) * element_at(q, CAST(i AS INT)))"""))
          .select($"vec_id", $"j", $"proj")
          .orderBy($"vec_id", $"j")
      },
      Some("""WITH q AS (SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS q
          FROM embeddings),
        j AS (SELECT CAST(unnest(generate_series(1, 16)) AS BIGINT) AS j)
        SELECT vec_id, j,
          CAST(list_sum(list_transform(generate_series(1, 64),
            i -> (CASE WHEN (((1103515245 * (j * 64 + i) + 12345) % 2147483648) // 1048576) % 2 = 0
                  THEN 1 ELSE -1 END) * q[i])) AS BIGINT) AS proj
        FROM q CROSS JOIN j
        ORDER BY vec_id, j"""),
      "Johnson-Lindenstrauss random projection 64->16 (Achlioptas +-1 sign " +
        "matrix from a deterministic LCG over e6-quantized vectors): the " +
        "training-free dimension-reduction step before ANN/clustering - " +
        "map-side HOF fold, no shuffle, exact integer output"),

    "embedding_minmax_normalize" -> Q(
      (s, d) => {
        import s.implicits._
        // Per-dimension MIN-MAX feature normalization (the preprocessing
        // step before distance-based anything — unnormalized dimensions
        // with wide ranges dominate L2/cosine): e6-quantized inputs, per-
        // dim [min, max] over the corpus in ONE 64-row aggregate, then
        // norm_e6 = (q − min)·1e6 // max(range, 1) — exact integer both
        // engines (idiv ≡ //; numerator non-negative). The stats table is
        // O(dims) and broadcast — a LEGITIMATE broadcast (64 rows at any
        // corpus size); the normalize itself is map-side. Min-max, not
        // z-score, deliberately: standardization needs sqrt(var) and libm
        // sqrt is not bit-stable across engines — the quantile-transform
        // alternative is percent_rank_normalize / quantile_normalize.
        val ex = emb(s, d)
          .select($"vec_id", posexplode($"embedding").as(Seq("p", "x")))
          .select($"vec_id", ($"p" + 1).cast("long").as("dim"),
            floor($"x".cast("double") * 1e6 + 0.5).cast("long").as("q"))
        val st = ex.groupBy($"dim").agg(min($"q").as("mn"), max($"q").as("mx"))
        ex.join(broadcast(st), "dim")
          .select($"vec_id", $"dim",
            idiv(($"q" - $"mn") * lit(1000000L),
              greatest($"mx" - $"mn", lit(1L))).as("norm_e6"))
          .orderBy($"vec_id", $"dim")
      },
      Some("""WITH ex AS (SELECT vec_id, CAST(i AS BIGINT) AS dim,
            CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
          FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
        st AS (SELECT dim, min(q) AS mn, max(q) AS mx FROM ex GROUP BY dim)
        SELECT vec_id, dim,
          CAST(((q - mn) * 1000000) // greatest(mx - mn, 1) AS BIGINT) AS norm_e6
        FROM ex JOIN st USING (dim)
        ORDER BY vec_id, dim"""),
      "Per-dimension min-max normalization of the embedding corpus (exact " +
        "e6 integers, one O(dims) stats aggregate broadcast back): the " +
        "preprocessing gate before distance-based dedup/ANN/clustering."),

    "embedding_pca_power" -> Q(
      (s, d) => {
        import s.implicits._
        // Dominant principal direction by POWER ITERATION over the exact
        // integer covariance — the eigen-step embedding_covariance's
        // Scaladoc promises: the corpus-sized work is the one covariance
        // aggregate (posexplode + vec-keyed self-join, dims² fan-out); the
        // iterate is O(dim²) on the collected 16×16 matrix — the sanctioned
        // bounded driver artifact (centroids/sketches contract). Arithmetic
        // is BigInt matvec + max-|component| renormalization back to 1e6
        // scale with SIGN-SPLIT floor division (components go negative;
        // Spark/JVM truncation ≡ DuckDB floor only after the sign split —
        // the graph_modularity guard). 4 rounds from the all-ones vector:
        // deterministic, bit-exact vs the unrolled SQL replay.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val S = 1000000L
        val ex = emb(s, d)
          .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
          .filter($"dim" < 16)
          .select($"vec_id", $"dim".cast("long").as("dim"),
            floor($"x".cast("double") * 1000.0 + 0.5).cast("long").as("q"))
        val cov = ex.as("a").join(ex.as("b"), $"a.vec_id" === $"b.vec_id")
          .groupBy($"a.dim".as("i"), $"b.dim".as("j"))
          .agg(count(lit(1)).as("n"),
            sum($"a.q").as("si"), sum($"b.q").as("sj"),
            sum($"a.q".cast(d38) * $"b.q".cast(d38)).as("sij"))
          .select($"i", $"j",
            // cov_num stays DECIMAL(38,0) to the driver: n·sij − si·sj
            // grows ~N²·10⁶ and a long-narrowing here would null-overflow
            // past ~3e6 vectors where the HUGEINT oracle still computes
            ($"n".cast(d38) * $"sij" - $"si".cast(d38) * $"sj".cast(d38))
              .as("cov_num"))
          .collect()
        val dim = 16
        val c = Array.fill(dim, dim)(BigInt(0))
        cov.foreach { r =>
          c(r.getLong(0).toInt)(r.getLong(1).toInt) =
            BigInt(r.getDecimal(2).toBigInteger)
        }
        var v = Array.fill(dim)(S)
        for (_ <- 1 to 4) {
          val u = Array.tabulate(dim) { i =>
            (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + c(i)(j) * v(j))
          }
          val m = u.map(_.abs).max.max(BigInt(1))
          v = u.map { ui =>
            if (ui >= 0) ((ui * S) / m).toLong else (-((-ui * S) / m)).toLong
          }
        }
        v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
          .toDF("dim", "v_scaled").orderBy("dim")
      },
      Some {
        val head = """WITH ex AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
            CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS q
          FROM embeddings, unnest(generate_series(1, 16)) AS t(i)),
        p AS (SELECT a.dim AS i, b.dim AS j, count(*) AS n,
            CAST(sum(a.q) AS BIGINT) AS si, CAST(sum(b.q) AS BIGINT) AS sj,
            sum(CAST(a.q AS HUGEINT) * b.q) AS sij
          FROM ex a JOIN ex b ON a.vec_id = b.vec_id
          GROUP BY 1, 2),
        cov AS (SELECT i, j, n * sij - CAST(si AS HUGEINT) * sj AS cov_num FROM p),
        v0 AS (SELECT CAST(i - 1 AS BIGINT) AS i, CAST(1000000 AS HUGEINT) AS v
          FROM unnest(generate_series(1, 16)) AS t(i))"""
        val rounds = (1 to 4).map { t =>
          val p = t - 1
          s"""u$t AS (SELECT c.i, sum(c.cov_num * v$p.v) AS u
              FROM cov c JOIN v$p ON v$p.i = c.j GROUP BY 1),
            m$t AS (SELECT greatest(max(abs(u)), 1) AS m FROM u$t),
            v$t AS (SELECT i, CASE WHEN u >= 0 THEN (u * 1000000) // m
                ELSE -(((-u) * 1000000) // m) END AS v FROM u$t, m$t)"""
        }
        (head +: rounds).mkString(",\n        ") +
          "\n        SELECT i AS dim, CAST(v AS BIGINT) AS v_scaled FROM v4 ORDER BY dim"
      },
      "Top principal direction of the 16-dim covariance block via 4 rounds " +
        "of integer power iteration (BigInt matvec, max-component renorm to " +
        "1e6, sign-split floor division): distributed sufficient statistics " +
        "+ O(dim²) driver iterate, bit-exact vs the unrolled SQL replay."),

    "calibration_bins" -> Q(
      (s, d) => {
        import s.implicits._
        // Reliability diagram over the k-NN verdicts: does vote count
        // actually track accuracy? Bin the predictions by their vote count
        // (the 5-NN confidence proxy), report per-bin accuracy in e6 —
        // the model-eval artifact that decides whether "4 of 5 neighbors
        // agree" means anything. O(queries) input, one aggregate.
        knnVerdicts(s, d)
          .groupBy($"votes")
          .agg(count(lit(1)).as("n"), sum($"correct").as("n_correct"))
          .select($"votes", $"n", $"n_correct",
            idiv(lit(1000000L) * $"n_correct", $"n").as("accuracy_e6"))
          .orderBy($"votes")
      },
      Some(s"""$knnCteSql
        SELECT votes, count(*) AS n, CAST(sum(correct) AS BIGINT) AS n_correct,
          (1000000 * CAST(sum(correct) AS BIGINT)) // count(*) AS accuracy_e6
        FROM v GROUP BY votes ORDER BY votes"""),
      "k-NN calibration (reliability diagram): per-vote-count prediction " +
        "accuracy in e6 — one aggregate over the verdict table."),

    "coreset_lightweight" -> Q(
      (s, d) => {
        import s.implicits._
        // Lightweight k-means coreset (the Bachem et al. 2018 shape): a
        // small weighted subset whose k-means cost approximates the full
        // corpus's — HALF sampled uniformly, HALF proportional to squared
        // distance from the global mean, weights ∝ 1/(m·q). Deterministic
        // integer re-expression (the sandbox demands replayability): the
        // "uniform" half is the vec_id-hash rule (every (n/64)-th id), the
        // "far" half is the top-64 by exact integer d², and the e6 weights
        // are cross-multiplied integer ratios. The shift-by-10⁴ guard keeps
        // the mean's integer division on non-negative sums (embedding
        // coords go negative; (q+C)−(μ+C) cancels in d²). Corpus-sized
        // work: one mean aggregate + one d² scan; selection is a top-k.
        val m = 64L
        val ex = emb(s, d)
          .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
          .filter($"dim" < 16)
          .select($"vec_id", $"dim",
            (floor($"x".cast("double") * 1000.0 + 0.5).cast("long") + 10000L).as("qs"))
        val mu = ex.groupBy($"dim").agg(
          idiv(sum($"qs"), count(lit(1))).as("mu"), count(lit(1)).as("nd"))
        val d2 = ex.join(broadcast(mu), "dim")
          .groupBy($"vec_id")
          .agg(sum(($"qs" - $"mu") * ($"qs" - $"mu")).as("d2"))
        val n = d2.count()
        val tot = d2.agg(sum($"d2")).head.getLong(0)
        // 10⁶·tot crosses BIGINT near 6e5 vectors at this quantization —
        // the product runs DECIMAL(38,0)/HUGEINT (the markov/Hits guard)
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val far = d2.orderBy($"d2".desc, $"vec_id").limit(m.toInt)
          .select($"vec_id", $"d2", lit("far").as("part"),
            idiv(lit(1000000L).cast(d38) * lit(tot).cast(d38),
              (lit(2L * m) * greatest($"d2", lit(1L))).cast(d38))
              .cast("long").as("weight_e6"))
        val uni = d2.filter($"vec_id" % greatest(lit(n / m), lit(1L)) === 0L)
          .select($"vec_id", $"d2", lit("uniform").as("part"),
            lit((1000000L * n) / (2L * m)).as("weight_e6"))
        far.unionByName(uni).orderBy($"part", $"vec_id")
      },
      Some("""WITH ex AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
            CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) + 10000 AS qs
          FROM embeddings, unnest(generate_series(1, 16)) AS t(i)),
        mu AS (SELECT dim, CAST(sum(qs) AS BIGINT) // count(*) AS mu FROM ex GROUP BY 1),
        d2 AS (SELECT vec_id, CAST(sum((qs - mu) * (qs - mu)) AS BIGINT) AS d2
          FROM ex JOIN mu ON ex.dim = mu.dim GROUP BY 1),
        st AS (SELECT count(*) AS n, CAST(sum(d2) AS BIGINT) AS tot FROM d2),
        far AS (SELECT vec_id, d2, 'far' AS part,
            CAST((CAST(1000000 AS HUGEINT) * (SELECT tot FROM st))
              // (128 * greatest(d2, 1)) AS BIGINT) AS weight_e6
          FROM d2 ORDER BY d2 DESC, vec_id LIMIT 64),
        uni AS (SELECT vec_id, d2, 'uniform' AS part,
            (1000000 * (SELECT n FROM st)) // 128 AS weight_e6
          FROM d2 WHERE vec_id % greatest((SELECT n FROM st) // 64, 1) = 0)
        SELECT * FROM far UNION ALL SELECT * FROM uni
        ORDER BY part, vec_id"""),
      "Lightweight k-means coreset: uniform half (deterministic id rule) + " +
        "farthest-from-mean half (exact integer d² top-64) with e6 " +
        "inverse-importance weights — one mean aggregate, one d² scan, one " +
        "top-k; shift-by-C keeps the mean division non-negative."),

    "ann_recall_eval" -> Q(
      (s, d) => {
        import s.implicits._
        // ANN RECALL EVALUATION — the quality harness every approximate
        // index needs before it replaces the exact path at scale: recall@5
        // of the IVF index (ann_ivf's exact registered configuration)
        // against the brute-force ground truth IN THE SAME METRIC (integer
        // L2² over the same e3 quantization — like vs like, so a miss is
        // the index's pruning, never representation drift). Both sides are
        // integer-exact, so the whole evaluation replays as SQL: the
        // unrolled quantized-Lloyd IVF chain and the exact top-k are CTEs
        // of one oracle. Scale: ground truth is O(Q·N) with broadcast
        // queries (the evaluation runs on a query SAMPLE at corpus scale —
        // Q is the knob); the comparison join is O(Q·k).
        val e = emb(s, d)
        val qs = e.filter($"vec_id" < 10)
        val cs = e.filter($"vec_id" >= 10)
        val approx = Ann
          .ivfTopKQuantized(qs, cs, k = 5, nprobe = 2, kCells = 8, iters = 3)
          .select($"query_id", $"neighbor_id", lit(1L).as("hit"))
        Ann.bruteForceTopKQuantized(qs, cs, k = 5)
          .join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy($"query_id")
          .agg(coalesce(sum($"hit"), lit(0L)).as("n_match"))
          .select($"query_id", $"n_match",
            idiv($"n_match" * 1000000L, lit(5L)).as("recall_e6"))
          .orderBy($"query_id")
      },
      Some(annRecallSql(k = 5, nprobe = 2, kCells = 8, iters = 3,
        scale = 1000L, dim = 64)),
      "ANN recall@5 harness: IVF (quantized-Lloyd, 2-probe) vs brute-force " +
        "integer-L2² ground truth in the identical metric — per-query match " +
        "count and e6 recall, the whole evaluation one SQL replay."),

    "mmr_diversified_topk" -> Q(
      (s, d) => {
        val e = emb(s, d)
        Ann.mmrDiversifiedTopK(e.filter(col("vec_id") < 10),
          e.filter(col("vec_id") >= 10), shortlist = 20, k = 5)
      },
      Some(mmrSql(shortlist = 20, k = 5, lamNum = 7L, lamDen = 10L,
        scale = 1000L, dim = 64)),
      "Max-min MMR diversification (λ=0.7): per query, greedy 5 picks from " +
        "the 20-nearest shortlist maximizing 3·min-distance-to-selected − " +
        "7·distance-to-query, all-integer on quantized vectors — the " +
        "dedup-aware retrieval readout, unrolled greedy replayed in SQL."))

  /** Shared k-NN verdict pipeline (knn_classify, classification_report):
    * exact cosine top-5 per held-out query (vec_id < 20) against the rest,
    * majority label with smallest-label ties via the one-pass struct
    * argmax. Broadcast queries, map-side cosine kernel, one tiny per-query
    * top-k shuffle, then O(queries·k) vote rows. */
  private def knnVerdicts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = emb(s, d)
    val labels = e.select($"vec_id", $"label".cast("long").as("lbl"))
    val topk = graft.operators.Ann.bruteForceTopK(
      e.filter($"vec_id" < 20), e.filter($"vec_id" >= 20), k = 5)
    val votes = topk
      .join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .groupBy($"query_id", $"lbl").agg(count(lit(1)).as("cnt"))
      .groupBy($"query_id")
      .agg(max(struct($"cnt", (-$"lbl").as("neg"))).as("win"))
      .select($"query_id", $"win.cnt".as("votes"), (-$"win.neg").as("pred_label"))
    votes
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("lbl", "true_label"), "query_id")
      .select($"query_id", $"true_label", $"pred_label", $"votes",
        ($"true_label" === $"pred_label").cast("long").as("correct"))
  }

  /** DuckDB replay of ann_recall_eval: [[ivfQuantizedSql]]'s unrolled
    * Lloyd+route+rank chain and the exact integer-L2² top-k as CTEs of one
    * query, joined per (query, neighbor) — count of hits and e6 recall.
    */
  private def annRecallSql(k: Int, nprobe: Int, kCells: Int, iters: Int,
      scale: Long, dim: Int): String = {
    val l2 = (a: String, b: String) =>
      s"""list_sum(list_transform(generate_series(1, $dim),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"""
    s"""WITH ${lloydChainCtes(kCells, iters, scale, dim, " WHERE vec_id >= 10")},
      qq AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id < 10),
      probes AS (SELECT vec_id AS query_id, cl AS cell FROM (
        SELECT qq.vec_id, c.cl,
          row_number() OVER (PARTITION BY qq.vec_id ORDER BY
            ${l2("qq.v", "c.v")}, c.cl) AS rn
        FROM qq CROSS JOIN c$iters c) WHERE rn <= $nprobe),
      scored AS (SELECT p.query_id, f.vec_id AS neighbor_id,
          CAST(${l2("a.v", "b.v")} AS BIGINT) AS d2
        FROM probes p JOIN fin f ON f.cl = p.cell
        JOIN qq a ON a.vec_id = p.query_id
        JOIN q b ON b.vec_id = f.vec_id),
      approx AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
        FROM scored) WHERE rank <= $k),
      ex AS (SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY a.vec_id ORDER BY
            ${l2("a.v", "b.v")}, b.vec_id) AS rank
        FROM qq a CROSS JOIN q b) WHERE rank <= $k)
      SELECT e.query_id,
        CAST(count(ap.neighbor_id) AS BIGINT) AS n_match,
        (count(ap.neighbor_id) * 1000000) // $k AS recall_e6
      FROM ex e LEFT JOIN approx ap
        ON ap.query_id = e.query_id AND ap.neighbor_id = e.neighbor_id
      GROUP BY 1 ORDER BY 1"""
  }

  /** DuckDB replay of [[Ann.mmrDiversifiedTopK]]: quantized shortlist +
    * pairwise-L2² CTEs, then the greedy max-min rounds unrolled (round 1 =
    * pure relevance; round r picks argmax of (lamDen−lamNum)·min-distance-
    * to-selected − lamNum·distance-to-query with a neighbor_id tiebreak).
    */
  private def mmrSql(shortlist: Int, k: Int, lamNum: Long, lamDen: Long,
      scale: Long, dim: Int): String = {
    val l2 = (a: String, b: String) =>
      s"""list_sum(list_transform(generate_series(1, $dim),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"""
    val head = s"""WITH qq AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id < 10),
      cc AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS v
      FROM embeddings WHERE vec_id >= 10),
      sl AS (SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS cv,
          CAST(${l2("q.v", "c.v")} AS BIGINT) AS d2q,
          row_number() OVER (PARTITION BY q.vec_id ORDER BY
            ${l2("q.v", "c.v")}, c.vec_id) AS srank
        FROM qq q CROSS JOIN cc c) WHERE srank <= $shortlist),
      pr AS (SELECT a.query_id, a.neighbor_id AS cid, b.neighbor_id AS sid,
          CAST(${l2("a.cv", "b.cv")} AS BIGINT) AS d2cs
        FROM sl a JOIN sl b ON a.query_id = b.query_id
          AND a.neighbor_id <> b.neighbor_id),
      s1 AS (SELECT query_id, CAST(1 AS BIGINT) AS round, neighbor_id, d2q,
          CAST(NULL AS BIGINT) AS div_min, CAST(NULL AS BIGINT) AS score10
        FROM sl WHERE srank = 1)"""
    val steps = (2 to k).map { r =>
      val p = r - 1
      s"""n$r AS (SELECT query_id, CAST($r AS BIGINT) AS round, neighbor_id,
            d2q, div_min,
            ($lamDen - $lamNum) * div_min - $lamNum * d2q AS score10 FROM (
          SELECT c.query_id, c.neighbor_id, c.d2q, min(p.d2cs) AS div_min
          FROM sl c JOIN pr p ON p.query_id = c.query_id
            AND p.cid = c.neighbor_id
          JOIN s$p s ON s.query_id = p.query_id AND s.neighbor_id = p.sid
          WHERE NOT EXISTS (SELECT 1 FROM s$p x
            WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
          GROUP BY 1, 2, 3)),
        p$r AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score10 DESC, neighbor_id) AS rn FROM n$r) WHERE rn = 1),
        s$r AS (SELECT query_id, round, neighbor_id, d2q, div_min, score10 FROM s$p
          UNION ALL
          SELECT query_id, round, neighbor_id, d2q, div_min, score10 FROM p$r)"""
    }
    (head +: steps).mkString(",\n      ") +
      s"""\n      SELECT query_id, round, neighbor_id, d2q, div_min, score10
      FROM s$k ORDER BY query_id, round"""
  }

  /** DuckDB mirror of [[knnVerdicts]] as a `WITH …` prefix ending in `v`. */
  private lazy val knnCteSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl,
            CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.lbl,
          ${sumSql("q.v[i] * c.v[i]")} AS dot,
          ${sumSql("q.v[i] * q.v[i]")} AS nq,
          ${sumSql("c.v[i] * c.v[i]")} AS nc
        FROM e q, e c WHERE q.vec_id < 20 AND c.vec_id >= 20),
        r AS (SELECT query_id, neighbor_id, lbl,
          row_number() OVER (PARTITION BY query_id
            ORDER BY dot / (sqrt(nq) * sqrt(nc)) DESC, neighbor_id) AS rank
        FROM p),
        vc AS (SELECT query_id, lbl, count(*) AS cnt FROM r WHERE rank <= 5
          GROUP BY 1, 2),
        w AS (SELECT query_id, lbl AS pred_label, cnt AS votes,
          row_number() OVER (PARTITION BY query_id ORDER BY cnt DESC, lbl) AS rn
        FROM vc),
        v AS (SELECT w.query_id, e.lbl AS true_label, w.pred_label, w.votes,
          CAST(CASE WHEN e.lbl = w.pred_label THEN 1 ELSE 0 END AS BIGINT) AS correct
        FROM w JOIN e ON w.query_id = e.vec_id WHERE w.rn = 1)"""
}
