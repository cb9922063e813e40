package graft

import graft.operators.Closure

/** Closure.ancestors: the to-convergence contract — depth is discovered
  * from the data, never capped; deep chains, forests, and empty inputs all
  * terminate with exactly the local replay's closure.
  */
class ClosureSpec extends SparkSpec {
  import spark.implicits._

  private def replay(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = edges.toMap
    edges.flatMap { case (id, _) =>
      Iterator.iterate(Option(id))(cur => cur.flatMap(parent.get))
        .drop(1).takeWhile(_.isDefined).map(_.get)
        .zipWithIndex
        .map { case (anc, i) => (id, anc, (i + 1).toLong) }
        .toSeq
    }.toSet
  }

  test("a 60-deep chain converges at its true depth (no hidden cap)") {
    // 0 <- 1 <- 2 <- ... <- 60: node 60 has 60 ancestors. A fixed-depth
    // unroll (hierarchy_closure stops at 3) would silently truncate here.
    val edges = (1L to 60L).map(i => (i, i - 1))
    val got = Closure.ancestors(edges.toDF("id", "pid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == replay(edges), "deep-chain closure mismatch")
    assert(got.map(_._3).max == 60L, "true depth must be reached")
    assert(got.size == (1 to 60).sum, "n*(n+1)/2 ancestor pairs on a chain")
  }

  test("a branchy forest matches the sequential replay") {
    val rnd = new scala.util.Random(5)
    // parent = a strictly smaller id -> guaranteed DAG (forest)
    val edges = (1L to 300L).map(i => (i, rnd.nextLong(i).max(0L)))
      .filter { case (_, p) => p >= 1 } // roots absent as ids, per contract
    val got = Closure.ancestors(edges.toDF("id", "pid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == replay(edges), "forest closure mismatch")
  }

  test("empty edges produce an empty closure, not a hang") {
    val got = Closure.ancestors(Seq.empty[(Long, Long)].toDF("id", "pid"))
    assert(got.count() == 0L)
  }

  test("path doubling ≡ frontier on a 1000-deep chain, in O(log depth) rounds") {
    // the pathological-depth regime the frontier shape is worst at: a
    // linked list 1000 deep. Doubling must converge in ~10 self-join
    // rounds (wall-clocked in ScaleBench; equivalence asserted here).
    val edges = (1L to 1000L).map(i => (i, i - 1))
    val viaDoubling = Closure.ancestorsDoubling(edges.toDF("id", "pid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaDoubling == replay(edges), "doubling closure mismatch on chain")
    assert(viaDoubling.map(_._3).max == 1000L)
  }

  test("path doubling ≡ frontier on the branchy forest") {
    val rnd = new scala.util.Random(5)
    val edges = (1L to 300L).map(i => (i, rnd.nextLong(i).max(0L)))
      .filter { case (_, p) => p >= 1 }
    val a = Closure.ancestors(edges.toDF("id", "pid"))
      .as[(Long, Long, Long)].collect().toSet
    val b = Closure.ancestorsDoubling(edges.toDF("id", "pid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b, "frontier vs doubling disagree on forest")
  }
}
