package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP: the strict-contiguity view→click→purchase pattern of the
  * batch `cep_pattern_match` run as a keyed state machine — Flink-CEP's
  * `next` semantics on Structured Streaming. State per key is the last TWO
  * relevant events (type + timestamp): O(1), not O(stream), and a match
  * spanning a micro-batch boundary (view in batch k, purchase in batch k+2)
  * still fires because the pair survives in state — the case any per-batch
  * window replay drops.
  *
  * Resource bounds (r8, OPT-IN since r9 — the default is the original
  * drop-free/unbounded contract; pass `lateToleranceUs >= 0` to arm them):
  *  - Keyed state EXPIRES: the stream carries a watermark
  *    (`lateToleranceUs` behind max event time) and each key arms an
  *    EventTimeTimeout `idleTimeoutUs` past its newest event; when the
  *    watermark passes it the key is evicted, so the store no longer grows
  *    with total distinct users forever — the Flink-CEP `within`-clause
  *    state-TTL behavior. (EventTime, not ProcessingTime: a
  *    processing-time timer re-arms `shouldRunAnotherBatch` forever and
  *    deadlocks `Trigger.AvailableNow` backlog drains.) Eviction is
  *    pattern-safe whenever `idleTimeoutUs >= windowUs`: an evicted prefix
  *    could only have matched a purchase more than `windowUs` of event time
  *    after it, which the `r.us - st.u1 <= windowUs` guard rejects anyway.
  *  - Late events are handled EXPLICITLY, not by an implicit staging
  *    contract: the watermark drops events more than `lateToleranceUs`
  *    behind the stream high-mark before they reach the state machine, and
  *    a within-tolerance straggler that is still older than its key's last
  *    folded timestamp is skipped by the fold (documented Flink
  *    `skip-late-elements` semantics) — it cannot join strict contiguity
  *    without rewriting already-emitted history.
  *
  * Within a micro-batch the group folds in (us, event_id) order. That
  * per-batch sort is a LOWER BOUND, not an implementation choice: the
  * grouped iterator arrives in shuffle order, and strict contiguity over an
  * unordered batch is undecidable until every event of the batch is seen
  * (any later-arriving event may sit BETWEEN two already-seen events and
  * break their adjacency) — so no O(1) incremental insertion into the keyed
  * state can be correct. The buffer is therefore bounded by one key's slice
  * of one micro-batch (not the stream), and the sort runs in place to keep
  * the hot-key constant small. Callers pre-filter to the relevant event
  * types (CEP's relevant-event projection — strict contiguity is over the
  * FILTERED stream).
  */
object CepMatch {

  case class In(user_id: Long, us: Long, event_id: Long, event_type: String)
  /** last two relevant events; empty slots carry type "" */
  case class St(t1: String, u1: Long, t2: String, u2: Long)
  case class Match(user_id: Long, view_us: Long, purchase_us: Long)

  /** DEFAULTS ARE DROP-FREE AND UNBOUNDED: with `lateToleranceUs < 0` (the
    * default) no watermark is attached, no event is ever dropped for
    * lateness, and keyed state never expires — the operator's original
    * (pre-r8) contract. Bounded state is an OPT-IN: pass
    * `lateToleranceUs >= 0` to attach a watermark that bound, and idle keys
    * are then evicted by an event-time timer (the Flink-CEP
    * `within`-clause state-TTL behavior; required for an open-ended
    * production stream whose key space grows forever).
    *
    * @param lateToleranceUs watermark delay; < 0 (default) = NO watermark:
    *        drop-free, unbounded state. >= 0 = events further than this
    *        behind the stream high-mark are dropped before the state
    *        machine, and idle-key eviction arms.
    * @param idleTimeoutUs idle-eviction bound (only with a watermark);
    *        -1 (default) = 2·windowUs, which makes eviction
    *        OUTPUT-PRESERVING (an evicted prefix could only match a
    *        purchase the windowUs guard rejects anyway — the safety
    *        condition is idleTimeoutUs >= windowUs). Passing an explicit
    *        smaller bound is the LOSSY partial-match TTL trade (tighter
    *        state at the price of dropping still-matchable prefixes of
    *        keys idle past the bound) — an opt-in, never the default. */
  def matches(events: DataFrame, windowUs: Long,
      idleTimeoutUs: Long = -1L,
      lateToleranceUs: Long = -1L): Dataset[Match] = {
    val bounded = lateToleranceUs >= 0
    val idleUs = if (idleTimeoutUs < 0) 2L * windowUs else idleTimeoutUs
    import events.sparkSession.implicits._
    // the watermark column stays in the frame (not projected away): the
    // event-time-timeout check requires the tagged column to reach the
    // stateful operator; the In encoder simply ignores it
    val tagged = events.selectExpr("user_id", "us", "event_id", "event_type")
      .withColumn("__ts", timestamp_micros(col("us")))
    val staged =
      if (bounded)
        tagged.withWatermark("__ts",
          s"${(lateToleranceUs + 999999L) / 1000000L} seconds")
      else tagged
    staged.as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
          if (bounded) GroupStateTimeout.EventTimeTimeout
          else GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[In], state: GroupState[St]) =>
          if (state.hasTimedOut) {
            // idle-key eviction: drop the pattern prefix; any purchase this
            // far out in event time fails the windowUs guard regardless
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(St("", 0L, "", 0L))
            // lastUs: newest timestamp already folded into state — a
            // straggler older than this is skipped explicitly
            var lastUs = if (st.t2 == "") Long.MinValue else st.u2
            val batch = it.toArray
            java.util.Arrays.sort(batch,
              Ordering.by((r: In) => (r.us, r.event_id)))
            val out = scala.collection.mutable.ArrayBuffer.empty[Match]
            batch.foreach { r =>
              if (r.us >= lastUs) { // empty state: lastUs=MinValue accepts any
                if (st.t1 == "view" && st.t2 == "click" &&
                    r.event_type == "purchase" && r.us - st.u1 <= windowUs)
                  out += Match(key, st.u1, r.us)
                st = St(st.t2, st.u2, r.event_type, r.us)
                lastUs = r.us
              } // else: late straggler, skipped (see Scaladoc)
            }
            state.update(st)
            if (bounded) {
              // arm the idle timer: fires once the watermark passes the
              // key's newest event by idleTimeoutUs (clamped above the
              // current watermark — setTimeoutTimestamp rejects past
              // timestamps)
              val wmMs = state.getCurrentWatermarkMs()
              // CEIL both ms conversions: floor would fire the timer up to
              // ~2 ms before lastUs + idleUs and break the documented
              // idleTimeoutUs >= windowUs output-preservation boundary
              state.setTimeoutTimestamp(
                math.max((lastUs + 999L) / 1000L, wmMs)
                  + math.max((idleUs + 999L) / 1000L, 1L))
            }
            out.iterator
          }
      }
  }
}
