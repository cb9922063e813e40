package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Croston forecasting: the online form of `operators.Croston` —
  * each demand occurrence updates O(1) keyed state (size EWMA, interval
  * EWMA, last demand day) and emits its rate forecast the moment it lands,
  * where the batch operator re-folds the whole demand history. Output is
  * row-identical to the batch fold (the same non-negative truncating
  * recurrences), so the batch recursive-CTE oracle replays this stream
  * bit-for-bit.
  *
  * Ordering contract as in [[HoltStream]]: rows within a micro-batch are
  * buffered and sorted by t (bounded — the input is the per-(key, demand
  * day) aggregate); across batches order holds because the caller stages
  * time-sliced batches. State is drop-free: three longs per key that ever
  * had demand — evicting an idle SKU would silently restart its interval
  * clock at the next demand.
  */
object CrostonStream {

  case class In(k: String, t: Long, v: Long)
  case class CState(z: Long, p: Long, tPrev: Long)
  case class Out(k: String, t: Long, v: Long, q: Long,
      size_z: Long, interval_p: Long, rate_e6: Long)

  /** One Croston step: None = first demand (z=v, p=1, realized interval 1),
    * matching the batch operator. All-non-negative, so `/` is exact floor
    * on both engines. Returns the new state AND the realized inter-demand
    * interval q it smoothed, so the emitted q and the interval EWMA share
    * one definition (they cannot drift apart if the recurrence changes). */
  def step(st: Option[CState], t: Long, v: Long): (CState, Long) = st match {
    case None => (CState(v, 1L, t), 1L)
    case Some(CState(z, p, tp)) =>
      val q = t - tp
      (CState((v + 4L * z) / 5L, (q + 4L * p) / 5L, t), q)
  }

  /** `demands` columns: k (series key), t (long demand-day index, globally
    * staged in t order across batches), v (long demand size). */
  def forecast(demands: DataFrame): Dataset[Out] = {
    import demands.sparkSession.implicits._
    demands.selectExpr("k", "t", "v").as[In]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[In], state: GroupState[CState]) =>
          var st = state.getOption
          val batch = it.toArray
          java.util.Arrays.sort(batch, Ordering.by((r: In) => r.t))
          val out = batch.map { r =>
            val (next, q) = step(st, r.t, r.v)
            st = Some(next)
            Out(key, r.t, r.v, q, next.z, next.p,
              1000000L * next.z / math.max(next.p, 1L))
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
