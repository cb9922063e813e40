package graft

import graft.operators.{Ann, Pq}
import org.apache.spark.sql.functions._

/** Product-quantization ANN invariants: codes are well-formed and ~30×
  * smaller than the raw vectors, ADC distances approximate true distances
  * well enough to keep recall above a floor vs the exact brute-force top-K,
  * and the whole pipeline (k-means training included) is deterministic.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = core.table(spark, sf("sf0.001"), "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 10)
  private lazy val cands = emb.filter($"vec_id" >= 10)

  test("codes are m integers in [0, k) for every vector") {
    val model = Pq.train(cands, m = 8, k = 16, iters = 2)
    assert(model.subDim == 8) // 64-dim / 8 subspaces
    val codes = Pq.encode(cands, model)
    val bad = codes.filter(size($"codes") =!= 8 ||
      exists($"codes", c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    assert(codes.count() == cands.count())
  }

  test("recall@5 vs exact brute force stays above the floor") {
    val model = Pq.train(cands, m = 8, k = 16, iters = 3)
    val exact = Ann.bruteForceTopK(queries, cands, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // nprobe=4 of 8 cells: this corpus is weakly clustered (top-5 cosine
    // ~0.3), so true neighbors spread across cells and a production tuning
    // probes more of them — measured 0.70 here vs 0.36 at nprobe=2
    val pq = Pq.ivfAdcTopK(queries, cands, model, k = 5, coarseK = 8, nprobe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 = $recall")
    // full-scan ADC+rerank (every cell probed): routing can only LOSE
    // shortlist candidates, so the unrouted recall must be >= the routed
    val full = Pq.ivfAdcTopK(queries, cands, model, k = 5, coarseK = 1, nprobe = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val fullRecall = (exact & full).size.toDouble / exact.size
    assert(fullRecall >= recall - 0.1,
      s"routing lost far more than expected: $fullRecall vs routed $recall")
    // exact re-ranking must help on this weakly-similar corpus, where the
    // top-5 cosine margin is far below the m=8 quantization error and raw
    // ADC ordering is noise (measured ~0.2 recall)
    val noRerank = Pq.ivfAdcTopK(queries, cands, model, k = 5, coarseK = 1,
        nprobe = 1, rerank = 0)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val noRerankRecall = (exact & noRerank).size.toDouble / exact.size
    assert(fullRecall >= noRerankRecall,
      s"rerank made recall worse: $fullRecall < $noRerankRecall")
  }

  test("fused ivfPq equals the two-phase train + ivfAdcTopK path") {
    // the r8 fast path (normalized-once persist, coarse quantizer trained
    // inside the joint PQ Lloyd) must be a pure re-shaping: same seeds, same
    // per-iteration means, same routing — identical shortlist and ranking
    val model = Pq.train(cands, m = 8, k = 16, iters = 3)
    val twoPhase = Pq.ivfAdcTopK(queries, cands, model, k = 5, coarseK = 8,
        coarseIters = 3, nprobe = 4)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val fused = Pq.ivfPq(queries, cands, m = 8, k = 16, iters = 3, topK = 5,
        coarseK = 8, nprobe = 4)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(twoPhase.map(t => (t._1, t._2, t._3)) == fused.map(t => (t._1, t._2, t._3)),
      s"two-phase ${twoPhase.size} rows vs fused ${fused.size}")
    // cosine re-rank runs over unit vectors in the fused path: equal up to
    // float rounding of the normalization
    twoPhase.zip(fused).foreach { case (a, b) =>
      assert(math.abs(a._4 - b._4) < 1e-9, s"$a vs $b") }
  }

  test("integer-quantized twin: recall floor vs exact L2, determinism") {
    // the registered ann_ivf_pq surface (r12 oracle promotion): ranks by
    // integer L2² on the e3 grid. Exact top-5 by that same metric is the
    // quality bar — quantization error only enters through the PQ codes and
    // routing, so recall must stay near the float pipeline's.
    val quantized = Pq.ivfPqQuantized(queries, cands, m = 8, k = 16, iters = 3,
        topK = 5, coarseK = 8, nprobe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val q = (df: org.apache.spark.sql.DataFrame) => df.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        x => floor(x * 1000 + 0.5).cast("long")).as("v"))
    val d2 = aggregate(zip_with($"qv", $"cv", (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, t) => acc + t)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"d2", $"neighbor_id")
    val exact = q(queries).select($"vec_id".as("query_id"), $"v".as("qv"))
      .crossJoin(q(cands).select($"vec_id".as("neighbor_id"), $"v".as("cv")))
      .select($"query_id", $"neighbor_id", d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & quantized).size.toDouble / exact.size
    assert(recall >= 0.6, s"quantized-twin recall@5 = $recall")
    // deterministic: re-running the whole train+route+rank chain is
    // bit-identical (the property the standing SQL oracle relies on)
    val again = Pq.ivfPqQuantized(queries, cands, m = 8, k = 16, iters = 3,
        topK = 5, coarseK = 8, nprobe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(again == quantized)
  }

  test("pipeline is deterministic end-to-end") {
    def once(): Seq[(Long, Long, Long)] = {
      val model = Pq.train(cands, m = 4, k = 8, iters = 2)
      Pq.ivfAdcTopK(queries, cands, model, k = 3, coarseK = 4, nprobe = 2)
        .select($"query_id", $"rank", $"neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq
    }
    assert(once() == once())
  }

  test("oversized query batch fails loudly at the driver-side ADC bound (r14)") {
    // the per-query LUT build is driver-side by design (queries are the
    // bounded side); the guard must trip BEFORE collect() materializes an
    // unbounded set — limit(bound+1) keeps even the failing path cheap
    val model = Pq.Model(m = 1, k = 1, subDim = 2,
      codebooks = Array(Array(Array(0.5, 0.5))))
    val big = spark.range(Pq.MaxAdcQueries + 1)
      .select($"id".as("vec_id"), array(lit(1.0), lit(0.0)).as("embedding"))
    val small = spark.range(4)
      .select($"id".as("vec_id"), array(lit(0.0), lit(1.0)).as("embedding"))
    val e = intercept[IllegalArgumentException](
      Pq.ivfAdcTopK(big, small, model, k = 1, coarseK = 1, coarseIters = 1,
        nprobe = 1, rerank = 1).count())
    assert(e.getMessage.contains("chunk the query set"))
  }
}
