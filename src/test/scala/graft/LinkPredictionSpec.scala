package graft

import org.apache.spark.sql.functions._

/** graph_link_prediction invariants, proven against a local adjacency-set
  * replay of sf0.001: every emitted pair is (a) seed-rooted, (b) genuinely
  * non-adjacent, and (c) carries the exact common-neighbor count, degrees,
  * and floor-Jaccard the adjacency sets give — i.e. the wedge join + anti
  * join + degree joins lose and invent nothing on the rows they rank.
  */
class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val adj: Map[Long, Set[Long]] = {
    val li = core.table(spark, sf("sf0.001"), "lineitem")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val pairs = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private lazy val got =
    SparkEntry.queries("graph_link_prediction")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("emitted pairs are seed-rooted non-edges with exact CN/degree/Jaccard") {
    assert(got.nonEmpty)
    got.foreach { case (u, v, cn, du, dv, jacc) =>
      assert(u < 500, s"$u is not a seed")
      assert(!adj(u).contains(v), s"($u,$v) is an existing edge")
      val nu = adj(u); val nv = adj(v)
      assert(cn == nu.intersect(nv).size.toLong, s"cn mismatch at ($u,$v)")
      assert(du == nu.size.toLong && dv == nv.size.toLong)
      assert(jacc == 1000000L * cn / (du + dv - cn))
    }
  }

  test("ranking is the exact top-100 of the full local candidate set") {
    val all = (for {
      (u, nu) <- adj.toSeq if u < 500
      w <- nu; v <- adj(w) if v != u && !nu.contains(v)
    } yield (u, v)).distinct.map { case (u, v) =>
      val cn = adj(u).intersect(adj(v)).size.toLong
      val du = adj(u).size.toLong; val dv = adj(v).size.toLong
      (u, v, cn, du, dv, 1000000L * cn / (du + dv - cn))
    }
    val want = all.sortBy { case (u, v, cn, _, _, j) => (-cn, -j, u, v) }.take(100)
    assert(got == want)
  }
}
