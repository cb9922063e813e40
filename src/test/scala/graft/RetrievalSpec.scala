package graft

import org.apache.spark.sql.functions._

/** Locks the reciprocal-rank-fusion semantics of `hybrid_retrieval_rrf`
  * independently of the oracle: the fused score must equal the RRF formula
  * replayed driver-side from the two per-system rank lists, docs absent from
  * one list must still surface through the other, and the fusion must not
  * simply mirror either input ranking (i.e. both systems contribute).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fused =
    SparkEntry.queries("hybrid_retrieval_rrf")(spark, sf("sf0.001"))
      .as[(Long, Option[Long], Option[Long], Double)].collect()

  test("fused score replays the 1/(60+rank) formula from the emitted ranks") {
    assert(fused.nonEmpty)
    fused.foreach { case (id, rt, rv, rrf) =>
      val expect = rt.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rv.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(rrf == expect, s"doc $id: rrf $rrf != replay $expect")
    }
  }

  test("output is sorted by fused score desc with doc_id tiebreak, size 20, no dup docs") {
    assert(fused.length == 20)
    assert(fused.map(_._1).distinct.length == fused.length)
    val keys = fused.map { case (id, _, _, rrf) => (-rrf, id) }
    assert(keys.sameElements(keys.sorted), "not in (rrf desc, doc_id) order")
  }

  test("every emitted doc carries at least one system rank") {
    fused.foreach { case (id, rt, rv, _) =>
      assert(rt.isDefined || rv.isDefined, s"doc $id in neither list")
    }
  }

  test("both systems contribute: single-list docs from each side survive fusion") {
    // a doc ranked by only one system must still be able to reach the top 20
    // (RRF's point vs intersection-only fusion); on this corpus both kinds
    // occur, which also proves the full-outer fuse isn't an inner join
    assert(fused.exists { case (_, rt, rv, _) => rt.isDefined && rv.isEmpty })
    assert(fused.exists { case (_, rt, rv, _) => rt.isEmpty && rv.isDefined })
  }
}
