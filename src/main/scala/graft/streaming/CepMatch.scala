package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP: the strict-contiguity view→click→purchase pattern of the
  * batch `cep_pattern_match` run as a keyed state machine — Flink-CEP's
  * `next` semantics on Structured Streaming. State per key is the last TWO
  * relevant events (type + timestamp): O(1), not O(stream), and a match
  * spanning a micro-batch boundary (view in batch k, purchase in batch k+2)
  * still fires because the pair survives in state — the case any per-batch
  * window replay drops.
  *
  * Within a micro-batch the group folds in (us, event_id) order; across
  * batches order holds by the sequential time-sliced staging contract
  * (PrefixAnomaly's). Callers pre-filter to the relevant event types (CEP's
  * relevant-event projection — strict contiguity is over the FILTERED
  * stream).
  */
object CepMatch {

  case class In(user_id: Long, us: Long, event_id: Long, event_type: String)
  /** last two relevant events; empty slots carry type "" */
  case class St(t1: String, u1: Long, t2: String, u2: Long)
  case class Match(user_id: Long, view_us: Long, purchase_us: Long)

  def matches(events: DataFrame, windowUs: Long): Dataset[Match] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "us", "event_id", "event_type").as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[In], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St("", 0L, "", 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[Match]
          it.toSeq.sortBy(r => (r.us, r.event_id)).foreach { r =>
            if (st.t1 == "view" && st.t2 == "click" &&
                r.event_type == "purchase" && r.us - st.u1 <= windowUs)
              out += Match(key, st.u1, r.us)
            st = St(st.t2, st.u2, r.event_type, r.us)
          }
          state.update(st)
          out.iterator
      }
  }
}
