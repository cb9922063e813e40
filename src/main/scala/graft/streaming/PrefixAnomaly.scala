package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming prefix anomaly detection: flag each event whose value is a 3σ
  * outlier against the running statistics of every STRICTLY EARLIER event of
  * its series — the online form of the batch `anomaly_zscore` scan, with the
  * z² rule in the same all-integer cross-multiplied arithmetic:
  *
  *   z² = (n·x − S)² / (n·Σx² − S²)   over the prefix (n, S, Σx²)
  *
  * State per key is THREE BIGINTs (n, S, SS) — O(1), not O(history): the
  * whole point of running this as a stateful stream instead of a window
  * (DuckDB's `ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING` replays the
  * identical semantics for the oracle, but retains the full partition).
  * Within a micro-batch the group's rows are folded in (ts, id) order;
  * across micro-batches order holds because the caller stages time-sliced
  * batches (every event in batch k precedes every event in batch k+1) — the
  * same sequential-staging contract streaming_upsert_mor documents.
  *
  * Products run in BigInt on the JVM side ((n·x−S)² crosses 2⁶³ around 10⁵
  * rows/series at cent scale) and the emitted z² is the e6-scaled floor
  * both engines compute identically.
  *
  * Reference scope: the reference pipeline ships rows with no in-flight
  * analytics (SnowflakeProcessFunction.java); the online anomaly gate is
  * part of the training-data surface the brief adds.
  */
object PrefixAnomaly {

  case class In(event_type: String, ts_us: Long, event_id: Long, value_c: Long)
  case class Stats(n: Long, s: Long, ss: Long)
  case class Flag(event_id: Long, event_type: String, value_c: Long, z2_e6: Long)

  /** z²·10⁶ of `x` against prefix `st`, floored; -1 below the warmup. */
  def z2E6(st: Stats, x: Long, warmup: Long): Long =
    if (st.n < warmup) -1L
    else {
      val num = BigInt(st.n) * x - st.s
      val den = (BigInt(st.n) * st.ss - BigInt(st.s) * st.s).max(BigInt(1))
      (BigInt(1000000) * num * num / den).toLong
    }

  def push(st: Stats, x: Long): Stats =
    Stats(st.n + 1, st.s + x, st.ss + x * x)

  /** The streaming transform: events(event_type, ts_us, event_id, value_c)
    * → flagged outliers, state = (n, S, SS) per event_type.
    *
    * The per-batch (ts, id) sort is the same lower bound CepMatch documents:
    * the grouped iterator arrives in shuffle order, and "statistics of every
    * STRICTLY EARLIER event" is order-dependent within the batch, so the
    * one-key-one-batch slice must be buffered and ordered before the O(1)
    * fold — in-place over an array to keep the hot-key constant small; the
    * buffer is bounded by a batch, never the stream.
    *
    * DEFAULTS ARE DROP-FREE AND UNBOUNDED (the operator's original
    * contract): with `lateToleranceUs < 0` no watermark is attached, no
    * event is dropped for lateness, and series state never expires.
    * Bounded state is an OPT-IN for open-ended production monitors: pass
    * `lateToleranceUs >= 0` to attach a watermark, and idle series are then
    * evicted once the watermark passes `idleTimeoutUs` beyond the series'
    * newest event — EventTime, not ProcessingTime, so
    * `Trigger.AvailableNow` drains still terminate (see CepMatch). State
    * is a running prefix: eviction restarts the warmup for a series that
    * went quiet, the documented trade. */
  def flagged(events: DataFrame, warmup: Long, thresholdE6: Long,
      idleTimeoutUs: Long = 3600000000L,
      lateToleranceUs: Long = -1L): Dataset[Flag] = {
    val bounded = lateToleranceUs >= 0
    import events.sparkSession.implicits._
    // watermark column kept in-frame (event-time-timeout check needs it;
    // the In encoder ignores extras) — see CepMatch
    val tagged = events.selectExpr("event_type", "ts_us", "event_id", "value_c")
      .withColumn("__ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
    val staged =
      if (bounded)
        tagged.withWatermark("__ts",
          s"${(lateToleranceUs + 999999L) / 1000000L} seconds")
      else tagged
    staged.as[In]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
          if (bounded) GroupStateTimeout.EventTimeTimeout
          else GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[In], state: GroupState[Stats]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(Stats(0L, 0L, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[Flag]
            val batch = it.toArray
            java.util.Arrays.sort(batch,
              Ordering.by((r: In) => (r.ts_us, r.event_id)))
            var lastUs = Long.MinValue
            batch.foreach { r =>
              val z2 = z2E6(st, r.value_c, warmup)
              if (z2 > thresholdE6) out += Flag(r.event_id, key, r.value_c, z2)
              st = push(st, r.value_c)
              lastUs = math.max(lastUs, r.ts_us)
            }
            state.update(st)
            if (bounded) {
              val wmMs = state.getCurrentWatermarkMs()
              // ceil, not floor — see CepMatch: an early timer would shave
              // up to ~2 ms off the requested idle bound
              state.setTimeoutTimestamp(
                math.max((lastUs + 999L) / 1000L, wmMs)
                  + math.max((idleTimeoutUs + 999L) / 1000L, 1L))
            }
            out.iterator
          }
      }
  }
}
