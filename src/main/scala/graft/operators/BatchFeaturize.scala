package graft.operators

import org.apache.spark.sql.Dataset

/** Batch-decode plumbing for opaque multimodal payloads — the Scala
  * analogue of a `mapInPandas` decode stage: typed rows stream through
  * `mapPartitions`, grouped into fixed-size batches, and each batch goes to
  * the "decoder" in one call (a real image/audio library amortizes its FFI
  * and model-load cost over the batch; this sandbox has no codec libraries,
  * so the decode is a clearly-marked deterministic stub over the raw bytes —
  * the schema, partitioning, batch shape and typed Encoder plumbing are the
  * real thing).
  *
  * This is the ONE place the library drops out of Catalyst on purpose:
  * `mapPartitions` is opaque to the optimizer (no pushdown through it, no
  * codegen inside it), which is exactly the documented trade for calling an
  * external decoder. Everything upstream (column pruning to `doc_id`+payload)
  * and downstream (aggregations over the features) stays declarative.
  */
object BatchFeaturize {

  final case class AssetIn(doc_id: Long, payload: Array[Byte])
  final case class AssetFeatures(
      doc_id: Long,
      byte_len: Long,
      head_sum: Long,      // Σ of the first 256 bytes (unsigned)
      head_max: Long,
      stride_checksum: Long) // Σ of every 16th byte — a fake "embedding"

  /** Decode one batch. A real featurizer would hand the whole `batch` to a
    * native decoder here; the stub computes deterministic integer features
    * per asset so the plumbing is oracle-checkable. */
  private def decodeBatch(batch: Seq[AssetIn]): Seq[AssetFeatures] =
    batch.map { a =>
      val head = a.payload.take(256)
      val stride = a.payload.indices.by(16).map(i => (a.payload(i) & 0xFF).toLong)
      AssetFeatures(
        a.doc_id,
        a.payload.length.toLong,
        head.map(b => (b & 0xFF).toLong).sum,
        if (head.isEmpty) 0L else head.map(b => (b & 0xFF).toLong).max,
        stride.sum)
    }

  def featurize(assets: Dataset[AssetIn], batchSize: Int = 64): Dataset[AssetFeatures] = {
    require(batchSize > 0, "batchSize must be positive")
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }
}
