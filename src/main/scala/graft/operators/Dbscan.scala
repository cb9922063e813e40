package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN-style density clustering over the embedding store — the
  * NON-CENTROIDAL companion to [[KMeans]]: clusters are density-connected
  * regions of arbitrary shape, k is not chosen up front, and sparse points
  * come out as NOISE instead of being force-assigned to the nearest
  * centroid (the property k-means structurally cannot give a curation
  * pipeline hunting "is this embedding region dense enough to be a
  * near-dup family / topic cluster?").
  *
  * DETERMINISTIC canonical variant in the repo's quantized-integer
  * discipline (the kmeans_embeddings / semantic_dedup fixed point):
  *  - vectors quantize to units of 10^-3 (`floor(x·scale + 0.5)` longs);
  *    the ε-test is integer L2²: `Σ (a_i−b_i)² ≤ epsSq` — exact in both
  *    engines, no float tie ambiguity;
  *  - CORE point: ≥ `minPts` neighbors within ε (self excluded);
  *  - clusters: connected components of the core-core ε-graph
  *    ([[NearDup.connectedComponents]] min-label propagation — cluster id
  *    = min core vec_id, so labels are canonical, not visit-order
  *    dependent like textbook DBSCAN);
  *  - BORDER point: non-core with ≥ 1 core ε-neighbor — assigned to the
  *    MINIMUM cluster id among its core neighbors (textbook DBSCAN gives
  *    border ties to whichever cluster scans first; the min rule makes the
  *    output a pure function of the data);
  *  - NOISE: everything else (cluster −1).
  *
  * Scale shape: the ε-neighborhood join here is the EXACT all-pairs
  * baseline (the oracle replays the identical pair space) — same stance as
  * [[Ann.pairsAboveThreshold]]. In 64 dimensions no exact blocking scheme
  * prunes an ε-ball (the curse of dimensionality defeats grid cells), so
  * the 100 TB path is the SRP-banded candidate pruning the embedding
  * near-dup family already ships ([[Ann.lshPairs]] buckets, recall-bounded
  * in AnnSpec): band → exact ε-verify inside collisions → same core/border
  * rules. Degree counting, component propagation, and border assignment
  * are all keyed shuffles with no driver-side state.
  */
object Dbscan {

  /** @return (vec_id, cluster, is_core) for EVERY input vector; noise rows
    *         carry cluster = −1. */
  def dbscanQuantized(vectors: DataFrame, epsSq: Long, minPts: Int,
      scale: Long = 1000L): DataFrame = {
    val q = vectors.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => floor(x * scale + 0.5).cast("long")).as("v"))
    val a = q.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = q.select(col("vec_id").as("id_b"), col("v").as("vb"))
    // symmetric ε-neighbor list (both directions — degree and border
    // assignment read it per id_a); integer L2², no floats
    val nbr = a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("d2",
        aggregate(zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, t) => acc + t))
      .filter(col("d2") <= epsSq)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = nbr.groupBy(col("id_a")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minPts)
      .select(col("id_a").as("cid"))
    // components over the core-core subgraph; self-pairs keep isolated core
    // points (all their ε-neighbors are border) in the node set
    val coreEdges = nbr
      .join(core.withColumnRenamed("cid", "id_a"), Seq("id_a"))
      .join(core.withColumnRenamed("cid", "id_b"), Seq("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .unionByName(core.select(col("cid").as("id_a"), col("cid").as("id_b")))
    val comp = NearDup.connectedComponents(coreEdges)
      .select(col("doc_id").as("cid"), col("component_id"))
    // border: non-core with ≥1 core ε-neighbor → min neighboring cluster id
    val border = nbr
      .join(core.withColumnRenamed("cid", "id_b"), Seq("id_b"))
      .join(core.withColumnRenamed("cid", "id_a"), Seq("id_a"), "left_anti")
      .join(comp.withColumnRenamed("cid", "id_b"), Seq("id_b"))
      .groupBy(col("id_a")).agg(min(col("component_id")).as("cluster"))
      .select(col("id_a").as("vec_id"), col("cluster"))
    val coreOut = comp.select(col("cid").as("vec_id"),
      col("component_id").as("cluster"), lit(true).as("is_core"))
    vectors.select(col("vec_id"))
      .join(coreOut, Seq("vec_id"), "left")
      .join(border.withColumnRenamed("cluster", "bcluster"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("bcluster"), lit(-1L)).as("cluster"),
        coalesce(col("is_core"), lit(false)).as("is_core"))
      .orderBy(col("vec_id"))
  }
}
