package graft.operators

import graft.functions.nearest_centroid
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the training step
  * that produces [[Ann]]'s IVF coarse-quantizer centroids.
  *
  * Scale shape per iteration: centroids broadcast (O(k·d) — driver-held, the
  * same contract as Ann's centroid list), assignment is a per-row argmin over
  * the broadcast array (no join, no shuffle), and the centroid update is ONE
  * shuffle: explode the d dimensions → groupBy (cluster, dim) partial-avg.
  * Everything driver-side is O(k·d) per iteration; the data never leaves
  * executors. Deterministic end-to-end: init picks the k lowest-id vectors,
  * per-row distance arithmetic is a fixed-order fused kernel
  * ([[graft.functions.Kernels.nearestCentroid]] — one expression whatever k
  * is), and argmin ties break toward the lower cluster id — reruns give
  * identical assignments (no rand(), task-retry-safe).
  *
  * With mean centroids and squared-L2 assignment, Lloyd's inertia is
  * non-increasing per iteration — asserted in KMeansSpec.
  */
object KMeans {

  final case class Result(
      assignments: DataFrame,            // (id, cluster, dist_sq)
      centroids: Array[Array[Double]],   // k × d
      inertia: Seq[Double])              // per completed iteration

  def lloyd(emb: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      checkpointDir: Option[String] = None): Result = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    // The iterate state (the codebook) is driver-held, so unlike PageRank
    // there is no growing lineage to truncate — but every iteration re-scans
    // `emb`. With a checkpointDir, the projected input is materialized ONCE
    // to reliable storage: iterations re-read the checkpoint instead of
    // re-running the upstream plan (and an executor loss costs a file
    // re-read, not an upstream recompute). Bit-identical either way.
    val embP = new Checkpointer(checkpointDir) match {
      case ck if checkpointDir.isDefined => ck(emb.select(col(idCol), col(vecCol)))
      case _ => emb
    }
    val spark = emb.sparkSession
    import spark.implicits._

    // deterministic seeding: the k lowest-id vectors
    var centroids: Array[Array[Double]] = embP
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>")).as[Seq[Double]]
      .collect().map(_.toArray)

    def assigned(): DataFrame = {
      // argmin over the driver-held codebook in ONE fused expression
      // (NearestCentroid carries the matrix as a codegen reference object):
      // the expression tree stays O(1) however large k gets, where a fold of
      // per-centroid when() branches would grow O(k) and leave codegen
      val best = nearest_centroid(col(vecCol), centroids)
      embP.select(col(idCol).as("id"), col(vecCol).as("vec"), best.as("best"))
        .select($"id", $"vec", $"best.cluster".as("cluster"), $"best.dist_sq".as("dist_sq"))
    }

    val inertias = scala.collection.mutable.ArrayBuffer[Double]()
    var current: DataFrame = null
    for (_ <- 1 to iters) {
      current = assigned()
      inertias += current.agg(sum($"dist_sq")).head().getDouble(0)
      // ONE shuffle: (cluster, dim) partial means
      val next = current
        .select($"cluster", posexplode($"vec".cast("array<double>")).as(Seq("dim", "x")))
        .groupBy($"cluster", $"dim").agg(avg($"x").as("m"))
        .groupBy($"cluster")
        .agg(transform(array_sort(collect_list(struct($"dim", $"m"))),
          s => s.getField("m")).as("centroid"))
        .as[(Int, Seq[Double])].collect()
      val updated = centroids.clone()
      next.foreach { case (c, m) => updated(c) = m.toArray } // empty clusters keep their centroid
      centroids = updated
    }
    Result(assigned().drop("vec"), centroids, inertias.toSeq)
  }
}
