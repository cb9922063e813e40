package graft

import graft.streaming.PrefixAnomaly
import graft.streaming.PrefixAnomaly.{Flag, Stats}
import org.apache.spark.sql.functions._

/** PrefixAnomaly proofs: the O(1)-state fold equals a naive O(n²) prefix
  * recompute on adversarial sequences, the streamed run over time-sliced
  * micro-batches equals the batch window replay, and the cross-batch state
  * is load-bearing (resetting it per batch changes the answer).
  */
class PrefixAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("fold ≡ naive O(n²) prefix z² on adversarial sequences") {
    val seqs = Seq(
      Vector(1L, 1L, 1L, 1L, 100L, 1L, 1L),            // spike after constant run
      Vector(5L, 5L, 5L, 5L, 5L, 5L, 5L),              // zero variance throughout
      (1L to 60L).toVector :+ 1000L,                   // trend then spike
      Vector(-10L, 10L, -10L, 10L, -10L, 500L))        // oscillation, negatives
    seqs.foreach { xs =>
      var st = Stats(0L, 0L, 0L)
      xs.zipWithIndex.foreach { case (x, i) =>
        val pre = xs.take(i)
        val naive = if (i < 2) -1L
        else {
          val n = BigInt(i); val s = pre.map(BigInt(_)).sum
          val ss = pre.map(v => BigInt(v) * v).sum
          val num = n * x - s
          (BigInt(1000000) * num * num / (n * ss - s * s).max(BigInt(1))).toLong
        }
        assert(PrefixAnomaly.z2E6(st, x, warmup = 2L) == naive,
          s"mismatch at index $i of $xs")
        st = PrefixAnomaly.push(st, x)
      }
    }
  }

  test("streamed flags equal the batch prefix-window replay at sf0.001") {
    val flags = SparkEntry.queries("streaming_prefix_anomaly")(spark, sf("sf0.001"))
      .as[(Long, String, Long, Long)].collect().toSeq
    val ev = core.eventsTable(spark, sf("sf0.001"))
      .select($"event_type", unix_micros($"ts"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long, Long)].collect()
    val want = ev.groupBy(_._1).toSeq.flatMap { case (t, es) =>
      var st = Stats(0L, 0L, 0L)
      es.sortBy(e => (e._2, e._3)).flatMap { case (_, _, id, vc) =>
        val z2 = PrefixAnomaly.z2E6(st, vc, warmup = 30L)
        st = PrefixAnomaly.push(st, vc)
        if (z2 > 9000000L) Some((id, t, vc, z2)) else None
      }
    }.sortBy(_._1)
    assert(flags == want)
    assert(flags.nonEmpty, "no anomalies at sf0.001 - the gate is untested")
  }

  test("cross-batch state is load-bearing: per-batch reset changes the flags") {
    // replay the exact 4-slice staging locally; with state RESET at each
    // slice boundary every slice re-enters its own 30-event warmup, so the
    // flag set must differ from the continuous run — proving the streamed
    // result actually consumed state carried across micro-batches.
    val ev = core.eventsTable(spark, sf("sf0.001"))
      .select($"event_type", unix_micros($"ts"), $"event_id",
        ($"value".cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long, Long, Long)].collect()
    val cuts = ev.map(_._2).sorted.grouped(math.max(ev.length / 4, 1)).map(_.head).toSeq
    def run(resetPerSlice: Boolean): Set[Long] = {
      val bySlice = ev.groupBy(e => cuts.count(_ <= e._2)).toSeq.sortBy(_._1)
      val state = scala.collection.mutable.Map.empty[String, Stats]
      val out = scala.collection.mutable.Set.empty[Long]
      bySlice.foreach { case (_, es) =>
        if (resetPerSlice) state.clear()
        es.groupBy(_._1).foreach { case (t, ts) =>
          var st = state.getOrElse(t, Stats(0L, 0L, 0L))
          ts.sortBy(e => (e._2, e._3)).foreach { case (_, _, id, vc) =>
            if (PrefixAnomaly.z2E6(st, vc, 30L) > 9000000L) out += id
            st = PrefixAnomaly.push(st, vc)
          }
          state(t) = st
        }
      }
      out.toSet
    }
    val continuous = run(resetPerSlice = false)
    val reset = run(resetPerSlice = true)
    assert(continuous != reset,
      "per-batch reset produced identical flags - the slices never exercised carried state")
  }

  test("hot key: one series' 100k-event micro-batch folds and equals the local replay") {
    // a single skewed series delivers 100k events in ONE micro-batch — the
    // documented buffered-batch lower bound (the grouped iterator arrives
    // in shuffle order and "strictly earlier" is order-dependent, so the
    // one-key-one-batch slice is sorted in place). The buffer is bounded by
    // the micro-batch trigger knob, never the stream; this pins the hot-key
    // constant at 100k and the fold's exactness at that size.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val n = 100000
    val rnd = new scala.util.Random(13)
    val evs = (1 to n).map { i =>
      val v = if (i % 9973 == 0) 100000L else rnd.nextInt(100).toLong
      ("hot", 1000L * i, i.toLong, v)
    }
    val ms = MemoryStream[(String, Long, Long, Long)]
    val df = ms.toDF.toDF("event_type", "ts_us", "event_id", "value_c")
    val out = PrefixAnomaly.flagged(df, warmup = 30L, thresholdE6 = 9000000L)
    val q = out.writeStream.format("memory")
      .queryName("pa_hotkey_out").outputMode("append").start()
    val got =
      try {
        ms.addData(rnd.shuffle(evs): _*)
        q.processAllAvailable()
        spark.table("pa_hotkey_out")
          .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
      } finally {
        q.stop(); spark.catalog.dropTempView("pa_hotkey_out")
      }
    var st = Stats(0L, 0L, 0L)
    val want = evs.flatMap { case (_, _, id, vc) =>
      val z2 = PrefixAnomaly.z2E6(st, vc, 30L)
      st = PrefixAnomaly.push(st, vc)
      if (z2 > 9000000L) Some((id, "hot", vc, z2)) else None
    }
    assert(got == want, s"got ${got.size} flags, want ${want.size}")
    assert(want.nonEmpty, "no spikes fired - the hot-key case is untested")
  }
}
