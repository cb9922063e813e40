package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live bot-burst gate: the streaming twin of the batch
  * `bot_burst_detection` scan — a user's events fold through O(1) keyed
  * state (last event time, current run length, run start), and the gate
  * EMITS at the moment a run of sub-threshold inter-arrivals reaches
  * `flagAt` events (each qualifying run fires exactly once, at its
  * `flagAt`-th event — the actionable moment a live abuse gate cares
  * about, where the batch query reports the post-hoc census).
  *
  * Ordering contract: [[PrefixAnomaly]]'s — within a micro-batch rows sort
  * by (us, event_id); across batches the caller stages time-sliced batches
  * so arrival order is event-time order; stragglers behind the fold
  * high-mark are skipped. State is three longs per key, drop-free by
  * default (an evicted user would restart their run count mid-burst).
  */
object BurstGate {

  case class In(user_id: Long, us: Long, event_id: Long)
  case class GSt(lastUs: Long, runLen: Long, runStartUs: Long)
  case class Flag(user_id: Long, run_start_us: Long, flag_us: Long)

  def flags(events: DataFrame, gapUs: Long, flagAt: Long): Dataset[Flag] = {
    require(flagAt >= 2, s"flagAt must be >= 2, got $flagAt")
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "us", "event_id").as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[In], state: GroupState[GSt]) =>
          var st = state.getOption.getOrElse(GSt(Long.MinValue, 0L, Long.MinValue))
          val batch = it.toArray
          java.util.Arrays.sort(batch, Ordering.by((r: In) => (r.us, r.event_id)))
          val out = scala.collection.mutable.ArrayBuffer.empty[Flag]
          batch.foreach { r =>
            if (r.us >= st.lastUs) {
              val st2 =
                if (st.runLen > 0L && r.us - st.lastUs < gapUs)
                  GSt(r.us, st.runLen + 1L, st.runStartUs)
                else GSt(r.us, 1L, r.us)
              if (st2.runLen == flagAt)
                out += Flag(key, st2.runStartUs, r.us)
              st = st2
            } // else: late straggler behind the fold high-mark, skipped
          }
          state.update(st)
          out.iterator
      }
  }
}
