package graft

import graft.operators.Scc

/** [[Scc.run]] against a driver-side Tarjan reference: deterministic
  * structures (cycle, DAG path, two cycles joined by a bridge, self-loop)
  * plus randomized digraphs — the same brute-vs-distributed discipline as
  * ComponentsSpec. scc_id must be the component's MIN member id.
  */
class SccSpec extends SparkSpec {

  /** Tarjan's algorithm, iterative; returns node -> min member of its SCC. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    var counter = 0
    val out = scala.collection.mutable.Map.empty[Long, Long]
    def strongconnect(v0: Long): Unit = {
      // explicit work stack: (node, child cursor)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((v0, 0))
      index(v0) = counter; low(v0) = counter; counter += 1
      stack += v0; onStack += v0
      while (work.nonEmpty) {
        val (v, ci) = work.last
        val kids = adj(v)
        if (ci < kids.length) {
          work(work.length - 1) = (v, ci + 1)
          val w = kids(ci)
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            work += ((w, 0))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val (p, _) = work.last
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = -1L
            do {
              w = stack.remove(stack.length - 1); onStack -= w; comp += w
            } while (w != v)
            val m = comp.min
            comp.foreach(n => out(n) = m)
          }
        }
      }
    }
    nodes.foreach(n => if (!index.contains(n)) strongconnect(n))
    out.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Scc.run(edges.toDF("src", "dst")).as[(Long, Long)].collect().toMap
  }

  test("cycle, DAG path, bridge-joined cycles, self-loop") {
    // one 4-cycle
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // pure DAG path: all singletons (exercises the trim fixpoint)
    assert(run((1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq) ==
      (1L to 6L).map(n => n -> n).toMap)
    // two cycles joined one-way: distinct SCCs despite the bridge
    assert(run(Seq((1L, 2L), (2L, 1L), (2L, 10L), (10L, 11L), (11L, 10L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
    // self-loop and an isolated-in-edge-set node
    assert(run(Seq((5L, 5L), (5L, 6L))) == Map(5L -> 5L, 6L -> 6L))
  }

  test("diamond over singletons stays singleton (the (f,g)-collision trap)") {
    // a -> u -> b and a -> v -> b: u and v share every ancestor/descendant
    // min yet are NOT mutually reachable — a labeling scheme keyed on
    // (min-ancestor, min-descendant) pairs would wrongly merge them
    val r = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("randomized digraphs match Tarjan") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
      assert(run(edges) == tarjan(edges), s"trial $trial edges $edges")
    }
  }
}
