package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt linear smoothing: the online form of
  * `operators.HoltLinear` — each daily point of a series updates O(1) keyed
  * state (level, trend) and emits its smoothed row the moment it arrives,
  * where the batch operator re-folds the whole series. Output is
  * row-identical to the batch fold (the same truncating-division
  * recurrences, see HoltLinear), so the batch recursive-CTE oracle replays
  * this stream bit-for-bit.
  *
  * Ordering contract: within a micro-batch the group's rows are buffered
  * and sorted by t (bounded by the batch — and the input is the
  * day-AGGREGATED series, so a batch holds at most O(days) rows per key);
  * across micro-batches order holds because the caller stages time-sliced
  * batches (every point in batch k precedes batch k+1 — the
  * streaming_prefix_anomaly idiom). State is drop-free and unbounded by
  * the operator's contract: level/trend must carry across every boundary —
  * evicting an idle series would silently restart its smoothing from the
  * next point (the PrefixAnomaly warmup-restart trade); with O(series)
  * keys holding two longs each, there is nothing worth evicting.
  */
object HoltStream {

  case class In(k: String, t: Long, v: Long)
  case class HState(level: Long, trend: Long)
  case class Out(k: String, t: Long, v: Long, level: Long, trend: Long, forecast1: Long)

  /** One Holt step: None = series head (l=v, b=0), matching HoltLinear. */
  def step(st: Option[HState], v: Long): HState = st match {
    case None => HState(v, 0L)
    case Some(HState(l, b)) =>
      val l2 = (v + 4L * (l + b)) / 5L
      val b2 = ((l2 - l) + 9L * b) / 10L
      HState(l2, b2)
  }

  /** `daily` columns: k (series key), t (long, globally staged in t order
    * across batches), v (long).
    */
  def smoothed(daily: DataFrame): Dataset[Out] = {
    import daily.sparkSession.implicits._
    daily.selectExpr("k", "t", "v").as[In]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[In], state: GroupState[HState]) =>
          var st = state.getOption
          val batch = it.toArray
          java.util.Arrays.sort(batch, Ordering.by((r: In) => r.t))
          val out = batch.map { r =>
            val next = step(st, r.v)
            st = Some(next)
            Out(key, r.t, r.v, next.level, next.trend, next.level + next.trend)
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
