package graft

import graft.operators.Hits

/** HITS invariants: bit-exact equality with an in-memory sequential replay
  * of the same scaled-integer recurrence, the star-graph sanity ranking
  * (the hub pointing everywhere dominates; the authority everyone cites
  * dominates), sum-normalization conservation within floor slack, and
  * reliable-checkpoint mode bit-identical to executor-local mode.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Sequential replay of Hits.run's recurrence (Long/BigInt, no Spark). */
  private def replay(edges: Seq[(Long, Long)], rounds: Int): Map[(String, Long), Long] = {
    val e = edges.distinct
    val hubs = e.map(_._1).distinct.sorted
    var h: Map[Long, Long] = hubs.map(_ -> Scale / hubs.size).toMap
    var a: Map[Long, Long] = Map.empty
    for (_ <- 1 to rounds) {
      val rawA = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map(x => h(x._1)).sum
      }
      val ta = rawA.values.map(BigInt(_)).sum
      a = rawA.map { case (v, r) => v -> ((BigInt(Scale) * r) / ta).toLong }
      val rawH = e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => a(x._2)).sum
      }
      val th = rawH.values.map(BigInt(_)).sum
      h = rawH.map { case (u, r) => u -> ((BigInt(Scale) * r) / th).toLong }
    }
    h.map { case (n, s) => ("hub", n) -> s } ++
      a.map { case (n, s) => ("auth", n) -> s }
  }

  // bipartite: customers 1-3 → suppliers 101-103, uneven coverage
  private val bip = Seq(
    (1L, 101L), (1L, 102L), (1L, 103L), // 1 points at everything: top hub
    (2L, 101L), (3L, 101L),             // 101 cited by everyone: top authority
    (3L, 103L))

  private def got(edges: Seq[(Long, Long)], rounds: Int,
      dir: Option[String] = None): Map[(String, Long), Long] =
    Hits.run(edges.toDF("src", "dst"), rounds, Scale, dir)
      .as[(Long, String, Long)].collect()
      .map { case (n, role, s) => (role, n) -> s }.toMap

  test("bit-exact vs the sequential replay across round counts") {
    for (r <- 1 to 3)
      assert(got(bip, r) == replay(bip, r), s"mismatch at rounds=$r")
  }

  test("star ranking: the all-covering hub and the all-cited authority dominate") {
    val m = got(bip, 3)
    val hubScores = m.collect { case (("hub", n), s) => n -> s }
    val authScores = m.collect { case (("auth", n), s) => n -> s }
    assert(hubScores.maxBy(_._2)._1 == 1L, s"hub argmax: $hubScores")
    assert(authScores.maxBy(_._2)._1 == 101L, s"auth argmax: $authScores")
  }

  test("sum-normalization conserves Scale within per-node floor slack") {
    val m = got(bip, 2)
    val hubSum = m.collect { case (("hub", _), s) => s }.sum
    val authSum = m.collect { case (("auth", _), s) => s }.sum
    // each side floors once per node, so the total sits in (Scale-n, Scale]
    assert(hubSum <= Scale && hubSum > Scale - 3, s"hubSum=$hubSum")
    assert(authSum <= Scale && authSum > Scale - 3, s"authSum=$authSum")
  }

  test("reliable checkpoint mode is bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("hits_ckpt").toString
    assert(got(bip, 2, Some(dir)) == got(bip, 2))
  }
}
