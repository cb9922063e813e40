package graft.operators

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ByteType

/** Scalar-quantized (SQ8) ANN: each vector stored as int8 codes with a
  * per-vector max-abs scale — 4× smaller than float32 (the FAISS
  * `SQ8` / Milvus `IVF_SQ8` storage path), far more precise than PQ
  * (per-element error ≤ scale/254 vs PQ's per-subspace centroid error).
  * The scan computes integer dot products over the codes (codegen'd
  * zip_with/aggregate — multiply-accumulate on bytes), shortlists
  * `k·rerank` candidates per query, and re-ranks ONLY the shortlist with
  * the exact float cosine.
  *
  * Scale shape: queries broadcast; candidates stream map-side through the
  * int-dot projection; the per-query shortlist uses the bounded-state
  * [[graft.functions.TopKPairs]] aggregate (O(k·rerank) heap states,
  * map-side partial aggregation — NOT a window, which would funnel all
  * N_candidates rows of every query through one task each); only the tiny
  * shortlist joins back to the float vectors for the exact re-rank.
  */
object Sq8 {

  /** (codes array<tinyint>, scale, norm) columns for a float-vector column.
    * `scale` maps floats to [-127, 127]; `norm` is the float L2 norm kept
    * for cosine denominators (the quantized dot approximates the raw dot).
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val e = col(vecCol)
    df.withColumn("_mx", array_max(transform(e, x => abs(x))).cast("double"))
      .withColumn("sq8_scale",
        when(col("_mx") === 0.0, lit(1.0)).otherwise(lit(127.0) / col("_mx")))
      .withColumn("sq8_codes",
        transform(e, x => round(x.cast("double") * col("sq8_scale")).cast(ByteType)))
      .withColumn("sq8_norm",
        sqrt(aggregate(e, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .drop("_mx")
  }

  /** Integer multiply-accumulate over two code arrays (codegen'd). */
  private def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("int") * y.cast("int")),
      lit(0L), (acc, x) => acc + x.cast("long"))

  /** Integer-exact twin of [[topK]] (the ann_ivf/ann_lsh oracle-promotion
    * playbook): vectors quantize to e3 longs (`floor(x·scale + 0.5)`), the
    * int8 code scale is INTEGER max-abs (`(v_i · 127) DIV mx` — Spark DIV ≡
    * DuckDB `//`, both truncate toward zero, probed on negatives), the
    * shortlist priority is the sqrt-free signed square
    * `sign(dot) · (dot²·mx_c²·10⁶ DIV ‖c‖²)` (cosine ordering within a
    * query up to the per-query constant), and the re-rank is the exact
    * signed-square integer cosine `sign(dq) · (dq²·10¹² DIV ‖q‖²‖c‖²)`.
    * Every stage is BIGINT (DECIMAL(38,0) intermediates where products
    * near 10²⁴) ⇒ the whole scan + shortlist + re-rank chain replays as
    * DuckDB SQL hash-exact. The float [[topK]] stays the production path
    * (true cosine output), recall-spec-backed in AnnSpec.
    *
    * Bound audit (dim = 64, |x| ≤ ~1 ⇒ |v_i| ≤ ~scale): |dot| ≤ 64·127²
    * ≈ 1.0e6; dot²·mx² ≤ 1.1e18 — and since mx² ≤ ‖c‖², the priority
    * quotient ≤ dot²·10⁶ ≤ 1.1e18 < 2⁶³. dq² ≤ 4.2e15, ×10¹² ≤ 4.2e27
    * inside DECIMAL(38,0); the quotient ≤ 10¹² fits BIGINT.
    */
  def topKQuantized(queries: DataFrame, candidates: DataFrame, k: Int,
      rerank: Int = 4, scale: Long = 1000L): DataFrame = {
    import graft.core.idiv
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def quant(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col("vec_id").as(id),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * scale + 0.5).cast("long")).as(vec))
    def mxOf(vec: Column): Column =
      greatest(array_max(transform(vec, x => abs(x))), lit(1L))
    def codesOf(vec: Column, mx: Column): Column =
      transform(vec, x => idiv(x * 127, mx))
    def dotL(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, t) => acc + t)
    def n2Of(vec: Column): Column =
      aggregate(transform(vec, x => x * x), lit(0L), (acc, t) => acc + t)

    val q = quant(queries, "query_id", "qv")
      .withColumn("qc", codesOf(col("qv"), mxOf(col("qv"))))
      .withColumn("qn2", n2Of(col("qv")))
    val c = quant(candidates, "neighbor_id", "cv")
      .withColumn("cmx", mxOf(col("cv")))
      .withColumn("cc", codesOf(col("cv"), col("cmx")))
      .withColumn("cn2", n2Of(col("cv")))

    // int8 MAC scan + signed-square priority; per-query bounded shortlist
    // through TopKPairs ((p desc, id asc) total order — the identical
    // tie rule the SQL replay's row_number uses)
    val dot = dotL(col("qc"), col("cc"))
    val pAbs = idiv((dot.cast(d38) * dot.cast(d38) * col("cmx").cast(d38)
        * col("cmx").cast(d38) * lit(1000000L).cast(d38)),
      col("cn2").cast(d38)).cast("long")
    val shortlist = broadcast(q.select(col("query_id"), col("qc"))).crossJoin(
        c.select(col("neighbor_id"), col("cc"), col("cmx"), col("cn2")))
      .select(col("query_id"), col("neighbor_id"),
        (signum(dot).cast("long") * pAbs).as("p"))
      .groupBy(col("query_id"))
      .agg(topk_pairs(col("p"), col("neighbor_id"), k * rerank,
        descending = true).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.v").as("neighbor_id"))

    // exact integer re-rank of the O(k·rerank) shortlist only
    val dq = dotL(col("qv"), col("cv"))
    val sAbs = idiv(dq.cast(d38) * dq.cast(d38) * lit(1000000000000L).cast(d38),
      col("qn2").cast(d38) * col("cn2").cast(d38)).cast("long")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos2_e12").desc, col("neighbor_id"))
    shortlist
      .join(q.select(col("query_id"), col("qv"), col("qn2")), "query_id")
      .join(c.select(col("neighbor_id"), col("cv"), col("cn2")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (signum(dq).cast("long") * sAbs).as("cos2_e12"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos2_e12"))
      .orderBy("query_id", "rank")
  }

  def topK(queries: DataFrame, candidates: DataFrame, k: Int, rerank: Int = 4): DataFrame = {
    val q = quantize(queries, "embedding")
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("sq8_codes").as("qc"), col("sq8_scale").as("qs"), col("sq8_norm").as("qn"))
    val c = quantize(candidates, "embedding")
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        col("sq8_codes").as("cc"), col("sq8_scale").as("cs"), col("sq8_norm").as("cn"))

    // approximate cosine from the int8 dot, scaled to a BIGINT priority
    val approx = (intDot(col("qc"), col("cc")).cast("double")
      / (col("qs") * col("cs")) / (col("qn") * col("cn")))
    val shortlist = broadcast(q.drop("qv")).crossJoin(c.drop("cv"))
      .select(col("query_id"), col("neighbor_id"),
        (approx * 1e12).cast("long").as("p"))
      .groupBy(col("query_id"))
      .agg(topk_pairs(col("p"), col("neighbor_id"), k * rerank,
        descending = true).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.v").as("neighbor_id"))

    // exact re-rank of the O(k·rerank) shortlist only
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    shortlist
      .join(q.select(col("query_id"), col("qv")), "query_id")
      .join(c.select(col("neighbor_id"), col("cv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("qv"), col("cv")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }
}
