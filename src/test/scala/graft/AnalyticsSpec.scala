package graft

import org.apache.spark.sql.functions._

/** Semantics the Analytics queries lean on cross-engine. The survivorship
  * merge assumes `max_by(col, when(col.isNotNull, ord))` skips rows whose
  * order is NULL (mirroring DuckDB's `arg_max ... FILTER`): that assumption
  * is load-bearing for golden_record correctness, so it is pinned here on a
  * corpus where every interesting case — different columns winning from
  * different rows, an all-NULL column, a NULL in the latest row — occurs.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("max_by with NULLed order ignores unobserved rows (survivorship kernel)") {
    // key 1: latest row (ord 3) has NULL a, so a must come from ord 2 while
    //        b comes from ord 3 — different columns, different winners.
    // key 2: a is never observed -> NULL; b observed once.
    val df = Seq(
      (1L, 1L, Some("a1"), Some("b1")),
      (1L, 2L, Some("a2"), None),
      (1L, 3L, None, Some("b3")),
      (2L, 1L, None, Some("b9"))
    ).toDF("k", "ord", "a", "b")
    val got = df.groupBy($"k").agg(
        max_by($"a", when($"a".isNotNull, $"ord")).as("last_a"),
        max_by($"b", when($"b".isNotNull, $"ord")).as("last_b"))
      .orderBy($"k").as[(Long, Option[String], Option[String])].collect()
    assert(got.toSeq == Seq(
      (1L, Some("a2"), Some("b3")),
      (2L, None, Some("b9"))))
  }

  test("golden_record: per-column winners differ from the overall latest row") {
    val rows = SparkEntry.queries("golden_record")(spark, sf("sf0.001"))
    // the deterministic NULLing (status unreported when F, priority when
    // urgent) must actually produce customers whose last_status and
    // last_priority come from rows OLDER than last_seen_ord — i.e. the
    // filtered recency is doing real work, not collapsing to plain max_by
    val plain = core.table(spark, sf("sf0.001"), "orders").groupBy($"o_custkey")
      .agg(max_by($"o_orderstatus",
        unix_date($"o_orderdate".cast("date")).cast("long") * 10000000000L + $"o_orderkey")
        .as("naive_status"))
    val joined = rows.join(plain, "o_custkey")
    val differing = joined.filter($"last_status" =!= $"naive_status").count()
    assert(differing > 0,
      "NULLing never changed a winner - the survivorship path is untested by this data")
  }

  test("anomaly_zscore: integer flags bracket the double z-score rule") {
    // the integer rule (n·x−S)² > 9·(n·Σx²−S²) is |z|>3 multiplied through
    // by n² — so away from the exact z=3 boundary it must agree with the
    // float computation; assert the two-sided bracket instead of equality
    // so a boundary tie can never flake the suite.
    val d = sf("sf0.001")
    val flagged = SparkEntry.queries("anomaly_zscore")(spark, d)
      .select($"event_id").as[Long].collect().toSet
    val ev = core.eventsTable(spark, d)
      .select($"event_id", $"event_type", $"value").as[(Long, String, Double)]
      .collect()
    val stats = ev.groupBy(_._2).map { case (t, xs) =>
      val v = xs.map(e => math.round(e._3 * 100).toDouble)
      val n = v.length.toDouble
      val mu = v.sum / n
      val sd = math.sqrt(v.map(x => (x - mu) * (x - mu)).sum / n)
      t -> (mu, sd)
    }
    val z = ev.map { case (id, t, x) =>
      val (mu, sd) = stats(t); id -> math.abs(math.round(x * 100) - mu) / sd
    }.toMap
    assert(flagged.nonEmpty)
    flagged.foreach(id => assert(z(id) > 2.99, s"flagged $id has z=${z(id)}"))
    z.filter(_._2 > 3.01).keys.foreach(id =>
      assert(flagged.contains(id), s"unflagged $id has z=${z(id)}"))
  }

  test("event_path_topk: paths recompute from a local per-user replay") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("event_path_topk")(spark, d)
      .as[(String, Long)].collect()
    val ev = core.eventsTable(spark, d)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val local = ev.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).take(5).map(_._4).mkString(">")
    }.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    // the emitted counts must match the replay exactly, and the ranking
    // must be the count-desc/path-asc order over the replay's top-20
    got.foreach { case (p, n) => assert(local(p) == n, s"count mismatch at $p") }
    val want = local.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == want)
  }

  test("l_diversity: reported groups are exactly the <3-distinct ones") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("l_diversity")(spark, d)
      .select($"c_nationkey", $"c_mktsegment", $"bal_band", $"n_sensitive")
      .as[(Long, String, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._4 < 3))
    // recompute every group's distinct-sensitive count locally
    val c = core.table(spark, d, "customer")
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000.0).cast("long"))
      .as[(Long, Long, String, Long)].collect()
    val o = core.table(spark, d, "orders")
      .select($"o_custkey", $"o_orderpriority").as[(Long, String)].collect()
      .groupBy(_._1)
    val groups = c.groupBy(x => (x._2, x._3, x._4)).map { case (k, cs) =>
      k -> cs.flatMap(x => o.getOrElse(x._1, Array.empty[(Long, String)]).map(_._2))
        .distinct.length.toLong
    }
    val want = groups.filter(_._2 < 3).map { case ((n, m, b), ds) => (n, m, b, ds) }.toSet
    assert(got.toSet == want)
  }

  test("benford_digit_audit: local replay + share bookkeeping") {
    val got = SparkEntry.queries("benford_digit_audit")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (1L to 9L))
    val prices = core.table(spark, sf("sf0.001"), "orders")
      .select($"o_totalprice").as[Double].collect()
    val counts = prices.map(p => p.toLong.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = prices.length.toLong
    got.foreach { case (dg, n, obs, exp, dev) =>
      assert(n == counts(dg))
      assert(obs == 1000000L * n / total)
      assert(dev == math.abs(obs - exp))
    }
    // floored shares sum to 1e6 minus at most 9 ulps of floor slack
    val sumObs = got.map(_._3).sum
    assert(sumObs > 1000000L - 9 && sumObs <= 1000000L)
  }

  test("dow_seasonality: index recomputes from local sums") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("dow_seasonality")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    val ev = core.eventsTable(spark, d)
      .select($"event_type", dayofweek($"ts").cast("long"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    val byType = ev.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._3).sum)).toMap
    val byDow = ev.groupBy(x => (x._1, x._2)).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._3).sum)).toMap
    assert(got.nonEmpty)
    got.foreach { case (t, dow, nDow, sumDow, idx) =>
      val (nTot, sumTot) = byType(t)
      assert((nDow, sumDow) == byDow((t, dow)))
      val want = (BigInt(1000000) * sumDow * nTot / (BigInt(nDow) * sumTot)).toLong
      assert(idx == want, s"index mismatch at ($t,$dow)")
    }
  }

  test("fk_integrity_audit: the star schema is referentially intact") {
    val got = SparkEntry.queries("fk_integrity_audit")(spark, sf("sf0.001"))
      .as[(String, Long)].collect().toMap
    assert(got.keySet == Set("lineitem->orders", "lineitem->part",
      "lineitem->supplier", "orders->customer"))
    assert(got.values.forall(_ == 0L),
      s"synthetic TPC-H data must have no orphans, got $got")
  }

  test("rfm_segmentation: buckets are balanced and metric-monotone") {
    val got = SparkEntry.queries("rfm_segmentation")(spark, sf("sf0.001"))
      .select($"o_custkey", $"recency_d", $"frequency", $"monetary_c",
        $"r_bucket", $"f_bucket", $"m_bucket")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val n = got.length
    // (4·rank) div n buckets split n into quarters differing by ≤ 1
    Seq(got.map(_._5), got.map(_._6), got.map(_._7)).foreach { bs =>
      val sizes = bs.groupBy(identity).view.mapValues(_.size).toMap
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
      assert(sizes.values.max - sizes.values.min <= 1,
        s"unbalanced buckets $sizes over $n customers")
    }
    // monotone: sorting by (metric, custkey) must sort the bucket column
    def monotone(metric: (Long, Long, Long, Long, Long, Long, Long) => Long,
        bucket: (Long, Long, Long, Long, Long, Long, Long) => Long): Unit = {
      val sorted = got.sortBy(r => (metric.apply(r._1, r._2, r._3, r._4, r._5, r._6, r._7),
        r._1))
      val bs = sorted.map(r => bucket.apply(r._1, r._2, r._3, r._4, r._5, r._6, r._7))
      assert(bs.toSeq == bs.toSeq.sorted, "bucket not monotone in its metric")
    }
    monotone((_, r, _, _, _, _, _) => r, (_, _, _, _, b, _, _) => b)
    monotone((_, _, f, _, _, _, _) => f, (_, _, _, _, _, b, _) => b)
    monotone((_, _, _, m, _, _, _) => m, (_, _, _, _, _, _, b) => b)
  }

  test("ab_welch_t: t statistic recomputes from local integer sums") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("ab_welch_t")(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val ev = core.eventsTable(spark, d)
      .filter($"event_type".isin("click", "view"))
      .select(unix_micros(date_trunc("day", $"ts")), $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    val byDay = ev.groupBy(_._1)
    got.foreach { case (day, n1, n2, t) =>
      val xs = byDay(day)
      val a = xs.filter(_._2 == "click").map(_._3)
      val b = xs.filter(_._2 == "view").map(_._3)
      assert(n1 == a.length.toLong && n2 == b.length.toLong)
      def stats(v: Array[Long]) = {
        val n = v.length.toDouble; val s = v.sum.toDouble
        val ss = v.map(x => x * x).sum.toDouble
        (s / n, (n * ss - s * s) / (n * (n - 1.0)) / n)
      }
      val (m1, se1) = stats(a); val (m2, se2) = stats(b)
      val want = (m1 - m2) / math.sqrt(se1 + se2)
      assert(t == want, s"t mismatch at day $day: $t vs $want")
    }
  }

  test("clamped_running_balance: local fold replay + clamp actually fires") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("clamped_running_balance")(spark, d)
      .as[(Long, Long, Long)].collect()
    val ev = core.eventsTable(spark, d)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long, String, Long)].collect()
    var clampFired = false
    val want = ev.groupBy(_._1).map { case (u, es) =>
      val deltas = es.sortBy(e => (e._2, e._3))
        .map(e => if (e._4 == "purchase") -e._5 else e._5)
      val bal = deltas.foldLeft(0L) { (acc, x) =>
        val nxt = acc + x
        if (nxt < 0L) { clampFired = true; 0L } else nxt
      }
      (u, es.length.toLong, bal)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    assert(clampFired, "no user's balance ever hit the floor - the clamp is untested")
    assert(got.forall(_._3 >= 0L))
  }

  test("column_profile: counts recompute from a local pass") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("column_profile")(spark, d)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val ev = core.eventsTable(spark, d).collect()
    val n = ev.length.toLong
    assert(got.keySet == Set("event_id", "ts_us", "user_id", "event_type", "value", "props"))
    got.values.foreach { case (_, rows, nulls, distinct) =>
      assert(rows == n); assert(nulls >= 0L && distinct <= n)
    }
    assert(got("event_id")._4 == n, "event_id must be unique")
    val types = ev.map(_.getAs[String]("event_type")).distinct.length.toLong
    assert(got("event_type")._4 == types)
  }

  test("histogram_drift_tvd: local recompute + TV bounds") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("histogram_drift_tvd")(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val cut = java.time.Instant.parse("2024-01-08T00:00:00Z").toEpochMilli * 1000L
    val ev = core.eventsTable(spark, d)
      .select($"event_type", unix_micros($"ts"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (t, nA, nB, tvd) =>
      assert(tvd >= 0L && tvd <= 1000000L)
      val xs = ev.filter(_._1 == t)
      val a = xs.filter(_._2 < cut).map(e => math.min(e._3 / 5000L, 9L))
      val b = xs.filter(_._2 >= cut).map(e => math.min(e._3 / 5000L, 9L))
      assert(nA == a.length.toLong && nB == b.length.toLong)
      val num = (0L to 9L).map { band =>
        (BigInt(a.count(_ == band)) * b.length - BigInt(b.count(_ == band)) * a.length).abs
      }.sum
      val want = (BigInt(1000000) * num / (BigInt(2) * a.length * b.length)).toLong
      assert(tvd == want, s"tvd mismatch for $t")
    }
  }

  test("chi2_independence: statistic recomputes from the local contingency table") {
    val d = sf("sf0.001")
    val Array((nCells, dof, chi2)) =
      SparkEntry.queries("chi2_independence")(spark, d)
        .as[(Long, Long, Long)].collect()
    val ev = core.eventsTable(spark, d)
      .select($"event_type", dayofweek($"ts").cast("long"))
      .as[(String, Long)].collect()
    val cells = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = ev.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cols = ev.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = ev.length.toLong
    assert(nCells == cells.size.toLong)
    assert(dof == (rows.size - 1).toLong * (cols.size - 1).toLong)
    val want = cells.map { case ((t, w), o) =>
      val dev = BigInt(o) * n - BigInt(rows(t)) * cols(w)
      BigInt(1000000) * dev * dev / (BigInt(n) * rows(t) * cols(w))
    }.sum
    assert(BigInt(chi2) == want)
  }

  test("ts_interpolate_linear: knowns preserved, gaps on the integer line") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("ts_interpolate_linear")(spark, d)
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.exists(_._4) && got.exists(!_._4),
      "need both known and interpolated rows to test anything")
    val byType = got.groupBy(_._1)
    byType.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      // spine is contiguous and ends on known points
      assert(sorted.map(_._2).toSeq == (sorted.head._2 to sorted.last._2))
      assert(!sorted.head._4 && !sorted.last._4)
      // every interpolated value sits between its neighboring knowns
      // (floor-linear ⇒ within [min,max] of the bracketing known values)
      val knowns = sorted.filter(!_._4)
      knowns.sliding(2).foreach {
        case Array(lo, hi) =>
          val inner = sorted.filter(r => r._2 > lo._2 && r._2 < hi._2)
          inner.foreach { r =>
            assert(r._4, s"gap row ${r._2} not flagged interpolated")
            val (mn, mx) = (math.min(lo._3, hi._3), math.max(lo._3, hi._3))
            assert(r._3 >= mn && r._3 <= mx,
              s"interpolated ${r._3} outside [$mn,$mx] at hr ${r._2}")
            // exact floor-linear value
            val num = (hi._3 - lo._3) * (r._2 - lo._2)
            val den = hi._2 - lo._2
            val want = lo._3 + (if (num >= 0) num / den else -((-num) / den))
            assert(r._3 == want)
          }
        case _ =>
      }
    }
  }

  test("quantile_normalize: exact CDF lookup + monotone in the value") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("quantile_normalize")(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = core.eventsTable(spark, d)
      .select($"event_type", ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    val ref = ev.filter(_._1 == "view").map(_._2).sorted
    got.foreach { case (_, vc, pct) =>
      val cum = ref.count(_ <= vc).toLong
      assert(pct == 1000000L * cum / ref.length, s"pct mismatch at value $vc")
    }
    // monotone: a larger value can never map to a smaller percentile
    got.sortBy(_._2).map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("ewma_integer: per-series fold replays locally") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("ewma_integer")(spark, d)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = core.eventsTable(spark, d)
      .select($"event_type", unix_micros($"ts"),
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (t, n, ewma) =>
      val hourly = ev.filter(_._1 == t).groupBy(_._2 / 3600000000L)
        .view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1).map(_._2)
      assert(n == hourly.length.toLong)
      assert(ewma == hourly.foldLeft(0L)((acc, x) => (3 * acc + x) / 4))
    }
  }

  test("pseudonymize_audit: stable, collision-free, aggregates intact") {
    val d = sf("sf0.001")
    val got = SparkEntry.queries("pseudonymize_audit")(spark, d)
      .as[(String, Long, Long)].collect()
    val ev = core.eventsTable(spark, d)
      .select($"user_id", ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    val perUser = ev.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    // one pseudonym per user at this scale (48-bit space, 150 users)
    assert(got.length == perUser.size)
    def pseud(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"pepper1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    }
    val byP = perUser.map { case (u, agg) => pseud(u) -> agg }
    got.foreach { case (p, n, s) =>
      assert(byP(p) == ((n, s)), s"aggregate mismatch at $p")
    }
  }
}
