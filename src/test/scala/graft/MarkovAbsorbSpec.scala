package graft

import graft.operators.MarkovAbsorb
import org.scalatest.funsuite.AnyFunSuite

/** MarkovAbsorb: the scaled-integer absorbing-chain solve behind
  * markov_attribution_removal — exact values on hand-solvable chains,
  * removal semantics, and the arithmetic invariants the unrolled SQL
  * oracle replays.
  */
class MarkovAbsorbSpec extends AnyFunSuite {
  private val S = 1000000L

  test("a deterministic START->A->CONV chain converges to certainty") {
    val rows = Seq(("START", "A", 10L), ("A", "CONV", 10L))
    // k=1: p(A)=S, p(START)=0 (p(A) was 0 when START folded);
    // k>=2: p(START)=S. Value iteration needs one round per path hop.
    assert(MarkovAbsorb.absorb(rows, iters = 1, S) == 0L)
    assert(MarkovAbsorb.absorb(rows, iters = 2, S) == S)
    assert(MarkovAbsorb.absorb(rows, iters = 4, S) == S)
  }

  test("a 50/50 split chain halves the conversion, floored per state") {
    // START -> A (1) ; A -> CONV (1), A -> NULL (1)
    val rows = Seq(("START", "A", 1L), ("A", "CONV", 1L), ("A", "NULL", 1L))
    assert(MarkovAbsorb.absorb(rows, iters = 4, S) == S / 2)
  }

  test("duplicate (i,j) rows fold as if pre-aggregated") {
    val dup = Seq(("START", "A", 1L), ("START", "A", 2L), ("A", "CONV", 3L))
    val agg = Seq(("START", "A", 3L), ("A", "CONV", 3L))
    assert(MarkovAbsorb.absorb(dup, 4, S) == MarkovAbsorb.absorb(agg, 4, S))
  }

  test("removing the sole conversion channel erases all conversion") {
    val rows = Seq(("START", "A", 5L), ("A", "CONV", 3L), ("A", "NULL", 2L))
    val re = MarkovAbsorb.removalEffects(rows, Seq("A"), 4, S).toMap
    // base = 3/5 of S (single floor); removing A redirects START->NULL
    assert(re("A") == S * 3 / 5)
  }

  test("a channel off the conversion path has zero removal effect") {
    // START splits: via A it converts, via B it dies. Removing B changes
    // nothing about the A-path mass (START's denominator is unchanged).
    val rows = Seq(
      ("START", "A", 1L), ("START", "B", 1L),
      ("A", "CONV", 1L), ("B", "NULL", 1L))
    val re = MarkovAbsorb.removalEffects(rows, Seq("A", "B"), 4, S).toMap
    assert(re("B") == 0L)
    assert(re("A") == S / 2)
  }

  test("numerator sums are exact at counts past the BIGINT product range") {
    // c_ij ~ 4e12 with p ~ 1e6: the per-term product is ~4e18 (wraps a
    // signed 64-bit long); the BigInt path must not.
    val big = 4_000_000_000_000L
    val rows = Seq(("START", "A", big), ("A", "CONV", big))
    assert(MarkovAbsorb.absorb(rows, 4, S) == S)
  }
}
