package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP with the GREEDY KLEENE quantifier — Flink-CEP
  * `click.oneOrMore` between a view and a purchase, `within` windowUs:
  * view →fB click+ →fB purchase, where the click group absorbs EVERY click
  * between the view and the closing purchase (the batch `cep_one_or_more`
  * twin; the RELUCTANT variant — stop at the first click — is exactly
  * [[CepFollowedBy]]'s single-click chain).
  *
  * Keyed state extends [[CepFollowedBy]]'s two pending lists with the
  * absorbed-group SIZE carried per pending pair:
  *  - `views`: view timestamps awaiting their FIRST following click;
  *  - `pairs`: (view_us, clicks-so-far) — opened at 1 by the first click,
  *    and every subsequent click INCREMENTS every open pair (the greedy
  *    absorb: all clicks between the view and the closing purchase belong
  *    to the group);
  * a purchase resolves every pending pair: within-window ones emit
  * `(view_us, purchase_us, n_clicks)`, all clear. The `within` clause
  * remains the STATE BOUND (entries older than `t − windowUs` prune as
  * events fold), so state is O(events per window per key), never
  * O(stream). Batch-boundary, ordering, lateness, and eviction semantics
  * are [[CepMatch]]/[[CepFollowedBy]]'s verbatim.
  */
object CepOneOrMore {

  case class In(user_id: Long, us: Long, event_id: Long, event_type: String)
  case class KSt(views: List[Long], pairs: List[(Long, Long)], lastUs: Long)
  case class Match(user_id: Long, view_us: Long, purchase_us: Long, n_clicks: Long)

  def matches(events: DataFrame, windowUs: Long,
      idleTimeoutUs: Long = -1L,
      lateToleranceUs: Long = -1L): Dataset[Match] = {
    val bounded = lateToleranceUs >= 0
    val idleUs = if (idleTimeoutUs < 0) 2L * windowUs else idleTimeoutUs
    import events.sparkSession.implicits._
    val tagged = events.selectExpr("user_id", "us", "event_id", "event_type")
      .withColumn("__ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("us")))
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
        (key: Long, it: Iterator[In], state: GroupState[KSt]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(KSt(Nil, Nil, Long.MinValue))
            var views = st.views
            var pairs = st.pairs
            var lastUs = st.lastUs
            val batch = it.toArray
            java.util.Arrays.sort(batch,
              Ordering.by((r: In) => (r.us, r.event_id)))
            val out = scala.collection.mutable.ArrayBuffer.empty[Match]
            batch.foreach { r =>
              if (r.us >= lastUs) {
                val floor = r.us - windowUs
                if (views.nonEmpty) views = views.filter(_ >= floor)
                if (pairs.nonEmpty) pairs = pairs.filter(_._1 >= floor)
                r.event_type match {
                  case "view" => views = views :+ r.us
                  case "click" =>
                    // greedy absorb: every open pair grows by this click,
                    // pending views open at group size 1
                    pairs = pairs.map { case (v, c) => (v, c + 1) } ++
                      views.map(v => (v, 1L))
                    views = Nil
                  case "purchase" =>
                    pairs.foreach { case (v, c) =>
                      if (r.us - v <= windowUs) out += Match(key, v, r.us, c)
                    }
                    pairs = Nil
                  case _ => // relaxed contiguity ignores other events
                }
                lastUs = r.us
              }
            }
            state.update(KSt(views, pairs, lastUs))
            if (bounded) {
              val wmMs = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(
                math.max((lastUs + 999L) / 1000L, wmMs)
                  + math.max((idleUs + 999L) / 1000L, 1L))
            }
            out.iterator
          }
      }
  }
}
