package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LAST-TOUCH ATTRIBUTION: the batch `attribution_last_touch`
  * rule run as keyed state — per user the state is the SINGLE most recent
  * click (timestamp + id), O(1) per key, and each arriving purchase is
  * attributed against it immediately (within `lookbackUs`) or emitted
  * organic. A click in batch k attributes a purchase in batch k+n without
  * any reprocessing — the case a per-batch join replay cannot cover.
  *
  * Within a micro-batch the group folds in (us, event_id) order — the same
  * lower bound CepMatch documents (attribution against "the latest click
  * so far" is order-dependent within the batch, so the one-key-one-batch
  * slice must be buffered and ordered; the buffer is bounded by a batch,
  * never the stream). Ties (a click and a purchase at the same
  * microsecond) resolve by event_id — the oracle replays exactly that
  * (us, event_id) order.
  *
  * Drop-free and unbounded by default like CepMatch/PrefixAnomaly since
  * r9: no watermark is attached here; production monitors with an
  * unbounded user space should wrap the call with their own eviction
  * policy (the CepMatch opt-in pattern).
  */
object StreamingAttribution {

  case class In(user_id: Long, us: Long, event_id: Long, event_type: String,
      rev_c: Long)
  /** most recent click; us = Long.MinValue when none seen yet */
  case class Click(us: Long, id: Long)
  case class Attributed(event_id: Long, user_id: Long, purchase_us: Long,
      rev_c: Long, click_id: java.lang.Long, attributed: Boolean)

  def attribute(events: DataFrame, lookbackUs: Long): Dataset[Attributed] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "us", "event_id", "event_type", "rev_c")
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[In], state: GroupState[Click]) =>
          var st = state.getOption.getOrElse(Click(Long.MinValue, 0L))
          val batch = it.toArray
          java.util.Arrays.sort(batch,
            Ordering.by((r: In) => (r.us, r.event_id)))
          val out = scala.collection.mutable.ArrayBuffer.empty[Attributed]
          batch.foreach { r =>
            // keep the LATEST click by (us, id): a straggler click older
            // than the held one (possible only under out-of-order staging,
            // which the drop-free default admits) must not replace it
            if (r.event_type == "click" &&
                (r.us > st.us || (r.us == st.us && r.event_id > st.id)))
              st = Click(r.us, r.event_id)
            else if (r.event_type == "purchase") {
              val hit = st.us != Long.MinValue && r.us - st.us <= lookbackUs &&
                st.us <= r.us
              out += Attributed(r.event_id, key, r.us, r.rev_c,
                if (hit) java.lang.Long.valueOf(st.id) else null, hit)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
