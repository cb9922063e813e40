package graft

import graft.operators.KCore

/** k-core peeling invariants: a clique above the threshold survives intact,
  * peeling CASCADES down attached tails (each round exposes the next
  * too-weak node), k above the max degree empties the graph, and the
  * reliable-checkpoint mode is bit-identical to executor-local mode.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  /** undirected edge list → both directions */
  private def undirected(pairs: Seq[(Long, Long)]) = {
    val e = pairs ++ pairs.map { case (a, b) => (b, a) }
    e.toDF("src", "dst")
  }

  // 5-clique {1..5} with a 3-node tail 5-10-11-12 hanging off node 5
  private val clique = for {
    a <- 1L to 5L; b <- 1L to 5L if a < b
  } yield (a, b)
  private val tail = Seq((5L, 10L), (10L, 11L), (11L, 12L))

  test("a >=k clique survives with its full internal degree") {
    val got = KCore.kCore(undirected(clique ++ tail), k = 3, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 5L).map(_ -> 4L).toMap,
      s"expected exactly the 5-clique at degree 4, got $got")
  }

  test("peeling cascades: the tail needs one round per node, early exit at the fixpoint") {
    // tail end 12 peels in round 1 (deg 1), then 11, then 10 — a rounds
    // budget that covers the cascade must reach the same fixpoint as a
    // huge one (monotonicity), and an insufficient budget must not
    val full = KCore.kCore(undirected(clique ++ tail), k = 2, rounds = 8)
      .as[(Long, Long)].collect().toMap
    // k=2: the whole tail still dies (its nodes can never reach degree 2
    // once the end is gone), the clique survives
    assert(full.keySet == (1L to 5L).toSet, s"got $full")
    val partial = KCore.kCore(undirected(clique ++ tail), k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // after only 2 rounds the cascade has not consumed node 10 yet
    assert(partial.contains(10L) && !partial.contains(11L) && !partial.contains(12L),
      s"fixed 2-round peel should be mid-cascade, got $partial")
  }

  test("k above the max degree empties the graph") {
    val got = KCore.kCore(undirected(clique), k = 5, rounds = 4)
      .as[(Long, Long)].collect()
    assert(got.isEmpty)
  }

  test("reliable checkpoint mode is bit-identical") {
    val dir = "/tmp/graft_ckpt/kcore"
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val local = KCore.kCore(undirected(clique ++ tail), k = 3, rounds = 8)
      .as[(Long, Long)].collect().toSeq
    val reliable = KCore.kCore(undirected(clique ++ tail), k = 3, rounds = 8,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toSeq
    assert(local == reliable)
  }
}
