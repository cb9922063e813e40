package graft.operators

/** Absorbing-Markov-chain solve for removal-effect attribution.
  *
  * The chain is the per-user journey state machine (START → touch channels →
  * CONV/NULL). Its transition-count table is O(channels²) — a handful of rows
  * at ANY corpus scale — so after the one distributed count scan the solve is
  * honest driver-scale scalar work (the markov_stationary precedent: iterate
  * cost independent of corpus size; here 5 variants × K iterations would
  * otherwise replay the corpus scan ~40× through an uncached plan tree).
  *
  * Arithmetic discipline: backward absorption value iteration
  * p_{k+1}(i) = (Σ_j c_ij · p_k(j)) DIV c_i with p(CONV) = scale fixed,
  * p(NULL) = 0, transient p_0 = 0. The numerator sum is an exact BigInt —
  * order-independent — and the single floor per (state, iteration) replays
  * bit-for-bit as unrolled SQL on any engine with integer division.
  */
object MarkovAbsorb {

  /** P(absorb in CONV | start at START) after `iters` value iterations,
    * scaled to `scale`. `rows` = (i, j, count) transitions; duplicate (i, j)
    * pairs are summed (so callers may relabel without re-aggregating).
    */
  def absorb(rows: Seq[(String, String, Long)], iters: Int, scale: Long): Long = {
    val byI = rows.groupBy(_._1)
    val ci = byI.map { case (i, rs) => i -> rs.map(_._3).sum }
    var p = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      p = byI.map { case (i, rs) =>
        val num = rs.iterator.map { case (_, j, n) =>
          val pj =
            if (j == "CONV") scale
            else if (j == "NULL") 0L
            else p.getOrElse(j, 0L)
          BigInt(n) * pj
        }.sum
        i -> (num / ci(i)).toLong
      }
    }
    p.getOrElse("START", 0L)
  }

  /** Removal effect per channel: base conversion minus the conversion of the
    * chain with the channel removed (its outgoing rows dropped, transitions
    * INTO it redirected to NULL — the standard removal semantics: a journey
    * that would have passed through the channel dies there).
    */
  def removalEffects(
      rows: Seq[(String, String, Long)],
      channels: Seq[String],
      iters: Int,
      scale: Long): Seq[(String, Long)] = {
    val base = absorb(rows, iters, scale)
    channels.map { x =>
      val adj = rows.collect {
        case (i, j, n) if i != x => (i, if (j == x) "NULL" else j, n)
      }
      x -> (base - absorb(adj, iters, scale))
    }
  }
}
