package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt-Winters ADDITIVE smoothing: the online form of
  * `operators.HoltWinters` — each daily point updates O(period) keyed
  * state (level, trend, the m-slot seasonal ring and the position counter)
  * and emits its smoothed row + one-step seasonal forecast the moment it
  * lands, where the batch operator re-folds the whole series. The
  * recurrences are identical integer arithmetic, so the output is
  * row-identical to the batch fold and the SAME list-ring recursive-CTE
  * oracle gates both.
  *
  * Ordering, staging, and no-eviction contracts are [[HoltStream]]'s
  * verbatim (time-sliced batches, in-batch sort, state must carry — an
  * evicted series would silently restart its seasonal profile).
  */
object HoltWintersStream {

  case class In(k: String, t: Long, v: Long)
  case class WState(level: Long, trend: Long, ring: List[Long], i: Long)
  case class Out(k: String, t: Long, v: Long, level: Long, trend: Long,
      seasonal: Long, forecast1: Long)

  /** One Holt-Winters step; None = series head (l=v, b=0, zero ring). */
  def step(st: Option[WState], v: Long, period: Int): WState = st match {
    case None =>
      val ring = Array.fill(period)(0L)
      val sNew = (v - v + 3L * 0L) / 4L // = 0, spelled to mirror the batch
      ring(0) = sNew
      WState(v, 0L, ring.toList, 1L)
    case Some(WState(l, b, ringL, i)) =>
      val ring = ringL.toArray
      val sOld = ring((i % period).toInt)
      val l2 = ((v - sOld) + 4L * (l + b)) / 5L
      val b2 = ((l2 - l) + 9L * b) / 10L
      val sNew = ((v - l2) + 3L * sOld) / 4L
      ring((i % period).toInt) = sNew
      WState(l2, b2, ring.toList, i + 1L)
  }

  def smoothed(daily: DataFrame, period: Int = 7): Dataset[Out] = {
    import daily.sparkSession.implicits._
    daily.selectExpr("k", "t", "v").as[In]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[In], state: GroupState[WState]) =>
          var st = state.getOption
          val batch = it.toArray
          java.util.Arrays.sort(batch, Ordering.by((r: In) => r.t))
          val out = batch.map { r =>
            val next = step(st, r.v, period)
            st = Some(next)
            val sNew = next.ring(((next.i - 1L) % period).toInt)
            val sNext = next.ring((next.i % period).toInt)
            Out(key, r.t, r.v, next.level, next.trend, sNew,
              next.level + next.trend + sNext)
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
