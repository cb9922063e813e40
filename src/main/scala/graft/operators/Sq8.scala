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
