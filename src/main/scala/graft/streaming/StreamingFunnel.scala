package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming FUNNEL with per-stage conversion windows — the stateful twin
  * of the batch `funnel_conversion_windows`: per user the state is the
  * stage reached plus the timestamps the next stage's window hangs off
  * (O(1) per key), and each stage TRANSITION is emitted exactly once as it
  * happens — live funnel dashboards consume the transition stream instead
  * of re-running the batch query.
  *
  * Rules (identical to the batch query, so the composition is
  * oracle-replayable): stage 1 = the user's first view; stage 2 = the
  * first click with t_view < us ≤ t_view + w1Us; stage 3 = the first
  * purchase with t_click < us ≤ t_click + w2Us. Folds in (us, event_id)
  * order per micro-batch (the CepMatch buffered-batch lower bound);
  * a stage-3 user's state is terminal. Drop-free and unbounded by
  * default — the CepMatch r9 opt-in stance.
  */
object StreamingFunnel {

  case class In(user_id: Long, us: Long, event_id: Long, event_type: String)
  /** stage: 0 none, 1 viewed, 2 clicked, 3 purchased (terminal) */
  case class St(stage: Int, tView: Long, tClick: Long)
  case class Transition(user_id: Long, stage: String, us: Long)

  def transitions(events: DataFrame, w1Us: Long, w2Us: Long): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "us", "event_id", "event_type")
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[In], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(St(0, 0L, 0L))
          val batch = it.toArray
          java.util.Arrays.sort(batch,
            Ordering.by((r: In) => (r.us, r.event_id)))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          batch.foreach { r =>
            (st.stage, r.event_type) match {
              case (0, "view") =>
                st = St(1, r.us, 0L)
                out += Transition(key, "1_view", r.us)
              case (1, "click") if r.us > st.tView && r.us <= st.tView + w1Us =>
                st = St(2, st.tView, r.us)
                out += Transition(key, "2_click", r.us)
              case (2, "purchase") if r.us > st.tClick && r.us <= st.tClick + w2Us =>
                st = St(3, st.tView, st.tClick)
                out += Transition(key, "3_purchase", r.us)
              case _ => // wrong stage, outside the window, or terminal
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
