package graft

import org.apache.spark.sql.functions._

/** Local BigInt replays of the r13 statistics operators — each registered
  * query is recomputed sequentially from the same Spark-cast inputs
  * (identical floor/truncate order), so any drift in the distributed plan
  * surfaces as an exact mismatch here before the DuckDB gate runs.
  */
class StatsTestsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("multiple_testing_bh equals the sequential BH replay") {
    val got = SparkEntry.queries("multiple_testing_bh")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // inputs exactly as the engine derives them (same casts)
    val conv = core.eventsTable(spark, dir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase"
          && (core.dec2($"value") * 100).cast("long") >= 9000L, 1L)
        .otherwise(0L)).as("conv"))
      .select(pmod($"user_id", lit(24L)).as("arm"), $"conv")
      .as[(Long, Long)].collect().toSeq
    val byArm = conv.groupBy(_._1).map { case (a, rs) =>
      (a, BigInt(rs.size), BigInt(rs.map(_._2).sum))
    }.toSeq
    val nn = byArm.map(_._2).sum; val cc = byArm.map(_._3).sum
    val z2 = byArm.map { case (a, n1, c1) =>
      val n2 = nn - n1; val c2 = cc - c1
      val den = n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)
      val z = if (den == 0) BigInt(0)
        else (BigInt(1000000) * (c1 * n2 - c2 * n1).pow(2) * (n1 + n2)) / den
      (a, n1.toLong, c1.toLong, z.toLong)
    }
    val withP = z2.map { case (a, n1, c1, z) =>
      (a, n1, c1, z, math.min(1000000L, 1000000000000L / math.max(z, 1L)))
    }
    val m = withP.size.toLong
    val ranked = withP.sortBy { case (a, _, _, _, p) => (p, a) }.zipWithIndex
      .map { case ((a, n1, c1, z, p), i) => (a, n1, c1, z, p, i + 1L) }
    // suffix-min of the capped floored step-up
    val raws = ranked.map { case (_, _, _, _, p, r) => math.min(1000000L, p * m / r) }
    val adj = raws.indices.map(i => raws.drop(i).min)
    val want = ranked.zip(adj).map { case ((a, n1, c1, z, p, r), pa) =>
      (a, n1, c1, z, p, r, pa, if (pa <= 50000L) 1L else 0L)
    }.sortBy(_._1)
    assert(got.sortBy(_._1) == want)
  }

  test("bh adjusted p is non-decreasing in rank and bounded by 1e6") {
    val rows = SparkEntry.queries("multiple_testing_bh")(spark, dir)
      .select($"rnk", $"p_adj_e6").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.forall(_._2 <= 1000000L))
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a <= b); case _ => }
  }

  test("brown_forsythe_variance equals the sequential median+ANOVA replay") {
    val got = SparkEntry.queries("brown_forsythe_variance")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val rows = core.eventsTable(spark, dir)
      .select($"event_type", (core.dec2($"value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val z = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val vs = rs.map(_._2).sorted
      val med = vs((((vs.size + 1) / 2) - 1).max(0)) // low median
      rs.map(r => (r._1, math.abs(r._2 - med)))
    }
    val g = z.groupBy(_._1).toSeq.map { case (_, rs) =>
      (BigInt(rs.size), BigInt(rs.map(_._2).sum), rs.map(r => BigInt(r._2).pow(2)).sum)
    }
    val k = BigInt(g.size); val n = g.map(_._1).sum
    val s = g.map(_._2).sum; val ss = g.map(_._3).sum
    val a = g.map { case (ng, sg, _) => sg.pow(2) / ng }.sum
    val ssb = a - s.pow(2) / n; val ssw = ss - a
    val w = (BigInt(1000000) * ssb * (n - k)) / (ssw * (k - 1)).max(BigInt(1))
    assert(got == ((k.toLong, n.toLong, ssb.toLong, ssw.toLong, w.toLong)))
  }

  test("ar2_yule_walker equals the closed-form sequential replay") {
    val got = SparkEntry.queries("ar2_yule_walker")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    val days = core.table(spark, dir, "orders")
      .groupBy($"o_orderdate").agg(count(lit(1)).as("c"))
      .orderBy($"o_orderdate").select($"c").as[Long].collect()
    val n = days.length.toLong; val sm = days.sum
    val mu = sm / n
    val z = days.map(c => BigInt(c - mu))
    val c0 = z.map(_.pow(2)).sum
    val c1 = z.dropRight(1).zip(z.drop(1)).map { case (x, y) => x * y }.sum
    val c2 = z.dropRight(2).zip(z.drop(2)).map { case (x, y) => x * y }.sum
    val den = c0.pow(2) - c1.pow(2)
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / truncates like DIV
    val phi1 = if (den == 0) BigInt(0) else tdiv(BigInt(1000000) * c1 * (c0 - c2), den)
    val phi2 = if (den == 0) BigInt(0) else tdiv(BigInt(1000000) * (c0 * c2 - c1.pow(2)), den)
    val fc = BigInt(1000000) * mu + phi1 * z.last + phi2 * z(z.length - 2)
    assert(got == ((n, mu, c0.toLong, c1.toLong, c2.toLong,
      phi1.toLong, phi2.toLong, fc.toLong)))
  }

  test("textrank_keywords: len>=4 words, positive descending ranks, capped at 30") {
    val rows = SparkEntry.queries("textrank_keywords")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 30)
    assert(rows.forall { case (w, r) => w.length >= 4 && w.forall(_.isLower) && r > 0 })
    rows.sliding(2).foreach {
      case Seq((wa, ra), (wb, rb)) => assert(ra > rb || (ra == rb && wa < wb))
      case _ =>
    }
  }

  test("ann_recall_eval recall is bounded and matches the operator-level join") {
    val rows = SparkEntry.queries("ann_recall_eval")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 10)
    rows.foreach { case (_, m, r) =>
      assert(m >= 0L && m <= 5L && r == m * 1000000L / 5L)
    }
    // exact-vs-exact recall is 1e6 by construction (the harness's self-test)
    val e = core.table(spark, dir, "embeddings")
    val ex = graft.operators.Ann.bruteForceTopKQuantized(
      e.filter($"vec_id" < 10), e.filter($"vec_id" >= 10), k = 5)
      .select($"query_id", $"neighbor_id")
    val self = ex.join(ex.withColumnRenamed("neighbor_id", "nb2"),
        Seq("query_id"))
      .filter($"neighbor_id" === $"nb2")
      .groupBy($"query_id").count().as[(Long, Long)].collect()
    assert(self.forall(_._2 == 5L))
  }
}
