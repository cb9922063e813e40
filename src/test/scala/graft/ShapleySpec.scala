package graft

import graft.operators.Shapley
import org.scalatest.funsuite.AnyFunSuite

/** Shapley.phiScaled: the classic axioms hold EXACTLY (efficiency,
  * symmetry, dummy player) plus hand-solvable games — the properties a
  * sampled-permutation implementation only approximates.
  */
class ShapleySpec extends AnyFunSuite {

  test("single-channel game: the channel gets every attributable conversion") {
    // 7 converters touched channel 0; 3 touched nothing (baseline).
    val phi = Shapley.phiScaled(Seq((1, 7L), (0, 3L)), n = 1)
    assert(phi == Seq(7L)) // 1!·φ = v({0}) − v(∅) = 10 − 3
  }

  test("efficiency: Σ n!·φ = n!·(v(N) − v(∅)) on a random 4-channel game") {
    val rnd = new scala.util.Random(7)
    val counts = (0 until 16).map(m => (m, rnd.nextLong(50L)))
    val phi = Shapley.phiScaled(counts, 4)
    val vFull = counts.map(_._2).sum           // every mask ⊆ N
    val vEmpty = counts.find(_._1 == 0).get._2 // only mask 0 ⊆ ∅
    assert(phi.sum == 24L * (vFull - vEmpty))
  }

  test("symmetry: interchangeable channels get identical values") {
    // masks treat channels 0 and 1 identically
    val counts = Seq((1, 5L), (2, 5L), (3, 2L), (0, 9L))
    val phi = Shapley.phiScaled(counts, 2)
    assert(phi(0) == phi(1))
  }

  test("dummy player: an untouched channel gets exactly zero") {
    // channel 2's bit never set
    val counts = Seq((0, 4L), (1, 6L), (2, 3L), (3, 1L))
    val phi = Shapley.phiScaled(counts, 3)
    assert(phi(2) == 0L)
    // and dropping it rescales the others by exactly 3!/2! = 3
    val phi2 = Shapley.phiScaled(counts, 2)
    assert(phi(0) == 3L * phi2(0) && phi(1) == 3L * phi2(1))
  }

  test("hand-solved 2-channel game") {
    // v(∅)=0, v({0})=6, v({1})=0, v({0,1})=10:
    // φ0 = ((6−0) + (10−0))/2 = 8 ; φ1 = ((0−0) + (10−6))/2 = 2
    val counts = Seq((1, 6L), (3, 4L))
    val phi = Shapley.phiScaled(counts, 2)
    assert(phi == Seq(16L, 4L)) // scaled by 2!
  }

  test("duplicate masks accumulate") {
    val a = Shapley.phiScaled(Seq((1, 2L), (1, 3L)), 1)
    val b = Shapley.phiScaled(Seq((1, 5L)), 1)
    assert(a == b)
  }
}
