package graft.operators

/** K-minimum-values (KMV / bottom-k) distinct-count sketch combinators.
  *
  * The sketch of a key set is its k smallest DISTINCT 64-bit hashes, kept
  * sorted ascending. Unlike HLL (which the `approx_distinct*` queries use),
  * bottom-k sketches support SET INTERSECTION estimation: the k smallest
  * hashes of A ∪ B are computable from the two sketches alone, and the
  * fraction of them present in both input sketches is an unbiased Jaccard
  * estimate (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD'07) — so |A ∩ B| ≈ Ĵ · |A ∪ B|̂, which
  * inclusion-exclusion over HLL cannot do with usable error at small overlap.
  *
  * Distribution contract: sketches are built DISTRIBUTED (bounded-state
  * per-group k-min aggregation — see the `approx_distinct_intersection`
  * query, which feeds [[graft.functions.TopKAgg]] output here); these
  * combinators then run on the driver over O(groups · k) longs only.
  * Everything is deterministic given the hash function — same inputs, same
  * estimates, any cluster size.
  */
object Kmv {

  /** Fraction of the 64-bit hash space at or below `h` under SIGNED order —
    * the same order the k-min aggregation and [[union]] use, so θ_k and the
    * sketch agree on what "smallest" means. The xor maps Long.MinValue → 0,
    * Long.MaxValue → 2⁶⁴−1 monotonically w.r.t. signed order. */
  private def frac(h: Long): Double =
    ((h ^ Long.MinValue).toDouble + 1.0) / 1.8446744073709552e19 // 2^64

  /** Distinct-count estimate from a sorted-ascending distinct-hash sketch.
    * Saturated sketch (size == k): (k−1)/θ_k with θ_k the k-th smallest
    * hash's fraction of the hash space; unsaturated: the sketch IS the
    * distinct set, return its exact size. */
  def estimate(sketch: Array[Long], k: Int): Double = {
    require(sketch.length <= k, s"sketch larger than k: ${sketch.length} > $k")
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / frac(sketch(k - 1))
  }

  /** Sketch of the union: k smallest of the merged distinct hashes. Exactly
    * the sketch union(A, B) would have produced — bottom-k is closed under
    * union, which is what makes it mergeable across partitions/shards. */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val merged = new java.util.TreeSet[java.lang.Long]()
    a.foreach(merged.add(_)); b.foreach(merged.add(_))
    val out = new Array[Long](math.min(k, merged.size))
    val it = merged.iterator()
    var i = 0
    while (i < out.length) { out(i) = it.next(); i += 1 }
    out
  }

  /** (jaccard, intersection) estimates from two sketches: Ĵ = |K ∩ A ∩ B|/|K|
    * over the union sketch K, |A ∩ B|̂ = Ĵ · est(K). */
  def intersection(a: Array[Long], b: Array[Long], k: Int): (Double, Double) = {
    val u = union(a, b, k)
    if (u.isEmpty) return (0.0, 0.0)
    val sa = a.toSet; val sb = b.toSet
    val inBoth = u.count(h => sa.contains(h) && sb.contains(h))
    val j = inBoth.toDouble / u.length
    (j, j * estimate(u, k))
  }

  // ---- Integer-exact (oracle-replayable) estimators (r14) -----------------
  // The same KMV math as [[estimate]]/[[intersection]], but over hashes
  // drawn from [0, modulus) with the estimator as ONE exact integer rational
  // — (k−1)·modulus DIV kth-smallest — so a DuckDB replay computes the
  // identical value bit-for-bit (the `approx_distinct_intersection` oracle
  // promotion, VERDICT r13 "Next round" #2). The double-math pair above
  // stays as the production path for full-range signed hashes (xxhash64).

  /** Distinct-count estimate from a sorted sketch of hashes in [0, modulus):
    * unsaturated → exact size; saturated → (k−1)·modulus DIV h_(k). */
  def estimateInt(sketch: Array[Long], k: Int, modulus: Long): Long = {
    require(sketch.length <= k, s"sketch larger than k: ${sketch.length} > $k")
    if (sketch.length < k) sketch.length.toLong
    else (BigInt(k - 1) * BigInt(modulus) / BigInt(sketch(k - 1))).toLong
  }

  /** (nBoth, intersection estimate): |A ∩ B|̂ = nBoth·est(K) DIV |K| over the
    * union sketch K — integer-exact, replayed by the oracle SQL verbatim. */
  def intersectionInt(a: Array[Long], b: Array[Long], k: Int,
      modulus: Long): (Long, Long) = {
    val u = union(a, b, k)
    if (u.isEmpty) return (0L, 0L)
    val sa = a.toSet; val sb = b.toSet
    val nBoth = u.count(h => sa.contains(h) && sb.contains(h)).toLong
    val estU = estimateInt(u, k, modulus)
    (nBoth, (BigInt(nBoth) * BigInt(estU) / BigInt(u.length)).toLong)
  }
}
