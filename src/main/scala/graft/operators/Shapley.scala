package graft.operators

/** EXACT Shapley-value attribution over a small channel set.
  *
  * The coalition game is the standard attribution one: players = channels,
  * v(S) = conversions among users whose pre-conversion touch SET is ⊆ S
  * (users touching nothing convert under every coalition — that baseline
  * v(∅) mass is never attributed, exactly as the Shapley axioms demand).
  * With n ≤ ~20 channels the value is EXACT — no permutation sampling:
  *   n! · φ_i = Σ_{S ⊆ N∖{i}} |S|!·(n−|S|−1)! · [v(S∪{i}) − v(S)]
  * and every term is an integer (counts × factorials), so the scaled value
  * n!·φ is a bit-exact BIGINT on any engine.
  *
  * Scale shape: the corpus collapses to at most 2ⁿ (mask, conversions)
  * rows in ONE distributed aggregate; the subset-sum zeta transform and the
  * Shapley sum are O(2ⁿ·n) driver-side scalar work (the MarkovAbsorb
  * argument: solving in-plan would rescan the corpus per coalition).
  */
object Shapley {

  /** maskCounts: (touch bitmask, converted-user count); n = channel count
    * (bit i = channel i). Returns per channel i: n!·φ_i.
    */
  def phiScaled(maskCounts: Seq[(Int, Long)], n: Int): Seq[Long] = {
    require(n >= 1 && n <= 20, s"exact Shapley needs a small channel set, got $n")
    val full = 1 << n
    val cnt = Array.fill(full)(0L)
    maskCounts.foreach { case (m, c) =>
      require(m >= 0 && m < full, s"mask $m out of range for $n channels")
      cnt(m) += c
    }
    // zeta transform: v(S) = Σ_{m ⊆ S} cnt(m)
    val v = cnt.clone()
    for (i <- 0 until n; s <- 0 until full if (s & (1 << i)) != 0)
      v(s) += v(s ^ (1 << i))
    val fact = Array.iterate(BigInt(1), n + 1)(identity).zipWithIndex
      .map { case (_, k) => (1 to k).foldLeft(BigInt(1))(_ * _) }
    (0 until n).map { i =>
      val bit = 1 << i
      var acc = BigInt(0)
      for (s <- 0 until full if (s & bit) == 0) {
        val size = Integer.bitCount(s)
        acc += fact(size) * fact(n - size - 1) * (v(s | bit) - v(s))
      }
      // n!·φ can exceed Long near n = 20 (20! ≈ 2.4e18 alone): fail loudly
      // (ArithmeticException) instead of BigInt.toLong's silent wrap.
      acc.bigInteger.longValueExact()
    }
  }
}
