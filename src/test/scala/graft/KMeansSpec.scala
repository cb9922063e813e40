package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Lloyd's algorithm invariants for the IVF training path: with mean
  * centroids and squared-L2 assignment the inertia is non-increasing, runs
  * are deterministic (hash-free init, fixed-order arithmetic), and every
  * point lands on its true nearest centroid (argmin verified against an
  * independent recomputation).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = core.table(spark, sf("sf0.001"), "embeddings")

  test("inertia is monotonically non-increasing across iterations") {
    val r = KMeans.lloyd(emb, "vec_id", "embedding", k = 8, iters = 5)
    assert(r.inertia.size == 5)
    r.inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: ${r.inertia}")
    }
    assert(r.centroids.length == 8)
  }

  test("reruns are bit-identical (deterministic init + fixed-order arithmetic)") {
    val a = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 3)
    val b = KMeans.lloyd(emb, "vec_id", "embedding", k = 4, iters = 3)
    assert(a.inertia == b.inertia)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    val ca = a.assignments.orderBy("id").select("id", "cluster")
      .as[(Long, Int)].collect().toSeq
    val cb = b.assignments.orderBy("id").select("id", "cluster")
      .as[(Long, Int)].collect().toSeq
    assert(ca == cb)
  }

  test("assignment expression generates code (no CodegenFallback) for a large codebook") {
    // 256 centroids: a when()-fold would grow the tree O(k) and fall out of
    // codegen; NearestCentroid must stay a single codegen'd projection
    val codebook = Array.tabulate(256, 8)((c, d) => (c * 8 + d).toDouble)
    val df = emb.select(graft.functions.nearest_centroid(
      $"embedding".cast("array<double>"), codebook).as("b"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("nearestCentroid"), code.take(2000))
    assert(!code.contains("CodegenFallback"), code.take(2000))
    assert(df.count() > 0)
  }

  test("every point is assigned to its true nearest centroid") {
    val r = KMeans.lloyd(emb, "vec_id", "embedding", k = 6, iters = 2)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val got = r.assignments.select($"id", $"cluster", $"dist_sq")
      .as[(Long, Int, Double)].collect()
    def d2(x: Seq[Double], c: Array[Double]): Double =
      x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    for ((id, cl, ds) <- got) {
      val dists = r.centroids.map(c => d2(vecs(id), c))
      val best = dists.indexOf(dists.min)
      assert(cl == best, s"vec $id assigned $cl, nearest is $best")
      assert(math.abs(ds - dists.min) < 1e-6)
    }
  }
}
