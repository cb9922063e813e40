package graft.operators

import graft.functions.BloomMightContain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.shims

/** Bloom-prefiltered equi-join: build a Bloom filter over the build (dim)
  * side's join keys with a distributed `stat.bloomFilter` aggregation, then
  * drop probe (fact) rows that cannot match BEFORE the join's shuffle. The
  * filter admits false positives only, and the equi-join afterwards removes
  * them, so the join result is exactly the plain join's — what changes is the
  * fact side's exchange volume: ~|matching| + fpp·|non-matching| rows instead
  * of everything.
  *
  * This is the manual form of Spark's runtime bloom pruning
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when the
  * optimizer's injection heuristics don't fire (non-selective-looking dim
  * scans, pre-AQE layouts, or a dim computed by an earlier job). At 100 TB
  * the win is the difference between shuffling the full fact table and
  * shuffling only the slice a selective dimension actually joins.
  *
  * Memory contract: the filter itself lives on the driver and in each task
  * binary — `optimalNumOfBits(n, fpp)/8` bytes ≈ 1.2 MB per 1M keys at 1%
  * fpp. The `maxKeys` guard refuses builds that would not comfortably fit in
  * driver/task memory (at that point a shuffled semi-join is the right tool,
  * not a bigger bloom).
  */
object BloomJoin {

  val DefaultMaxKeys = 100000000L // ~120 MB of filter bits at 1% fpp

  /** Bloom filter of `dim`'s long-typed `dimKey` column. `expectedItems`
    * sizes the filter (overestimate is safe: fpp only improves). */
  def buildFilter(dim: DataFrame, dimKey: String, expectedItems: Long,
      fpp: Double = 0.01, maxKeys: Long = DefaultMaxKeys): org.apache.spark.util.sketch.BloomFilter = {
    require(expectedItems > 0 && expectedItems <= maxKeys,
      s"bloom join: $expectedItems expected keys exceeds the $maxKeys cap - " +
        "use a shuffled semi-join for dimension sides this large")
    dim.stat.bloomFilter(dimKey, expectedItems, fpp)
  }

  /** `fact` rows whose `factKey` might appear in `bloom` (exact superset of
    * the rows that join). The probe is a native codegen'd expression, so it
    * runs inside the scan's WholeStageCodegen span, upstream of any exchange. */
  def prefilter(fact: DataFrame, factKey: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    fact.filter(shims.toCol(BloomMightContain(shims.toExpr(fact(factKey)), bloom)))

  /** The fused form: inner equi-join of `fact` and `dim` on long keys with
    * the fact side bloom-prefiltered. Result is identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey))`. */
  def join(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(dim, dimKey, expectedItems, fpp)
    prefilter(fact, factKey, bf).join(dim, fact(factKey) === dim(dimKey))
  }
}
