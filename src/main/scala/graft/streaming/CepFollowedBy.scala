package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP with RELAXED contiguity — Flink-CEP's `followedBy`, its
  * DEFAULT production semantic, where [[CepMatch]] is the strict `next`:
  * view →followedBy click →followedBy purchase `within` windowUs. Relaxed
  * contiguity ignores non-matching events between the matching ones, and
  * (per Flink's `followedBy`, as opposed to `followedByAny`) each partial
  * match takes the FIRST occurrence of the next stage: a view pairs with
  * the first click after it, that pair matches the first purchase after
  * the click, and the match fires iff purchase_us − view_us ≤ windowUs.
  *
  * Keyed state is two pending lists, NOT the last-two-events register of
  * strict contiguity:
  *  - `views`: view timestamps still awaiting their first following click;
  *  - `pairs`: view timestamps whose click already arrived, awaiting the
  *    first following purchase (the click timestamp itself is not part of
  *    the within-bound, so only the view time is carried).
  * A click moves every pending view into `pairs` (they all share that
  * first-following click); a purchase resolves every pending pair — the
  * within-window ones emit, ALL of them clear (their first-following
  * purchase has been consumed, matched or failed — `followedBy`, not
  * `followedByAny`). The `within` clause is also the STATE BOUND: any entry
  * older than `t − windowUs` can never satisfy the bound against a future
  * purchase (event time is monotone after the fold's late-skip), so both
  * lists prune as events fold — state is O(events inside one window per
  * key), the same bound Flink-CEP's `within` gives its NFA, never
  * O(stream).
  *
  * Batch-boundary, ordering, lateness and eviction semantics are inherited
  * from [[CepMatch]] verbatim: per-batch (us, event_id) sort (the
  * buffered-batch lower bound — relaxed contiguity is still
  * order-sensitive), late stragglers behind the folded high-mark skipped,
  * drop-free/unbounded by default, opt-in watermark + event-time idle
  * eviction with `idleTimeoutUs >= windowUs` output-preserving by the same
  * argument (an evicted prefix could only match past the within bound).
  */
object CepFollowedBy {

  case class In(user_id: Long, us: Long, event_id: Long, event_type: String)
  case class FSt(views: List[Long], pairs: List[Long], lastUs: Long)
  case class Match(user_id: Long, view_us: Long, purchase_us: Long)

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
        (key: Long, it: Iterator[In], state: GroupState[FSt]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FSt(Nil, Nil, Long.MinValue))
            var views = st.views
            var pairs = st.pairs
            var lastUs = st.lastUs
            val batch = it.toArray
            java.util.Arrays.sort(batch,
              Ordering.by((r: In) => (r.us, r.event_id)))
            val out = scala.collection.mutable.ArrayBuffer.empty[Match]
            batch.foreach { r =>
              if (r.us >= lastUs) {
                // within-window pruning = the state bound (see Scaladoc)
                val floor = r.us - windowUs
                if (views.nonEmpty) views = views.filter(_ >= floor)
                if (pairs.nonEmpty) pairs = pairs.filter(_ >= floor)
                r.event_type match {
                  case "view" => views = views :+ r.us
                  case "click" =>
                    if (views.nonEmpty) { pairs = pairs ++ views; views = Nil }
                  case "purchase" =>
                    pairs.foreach { v =>
                      if (r.us - v <= windowUs) out += Match(key, v, r.us)
                    }
                    pairs = Nil
                  case _ => // non-relevant event: relaxed contiguity ignores it
                }
                lastUs = r.us
              } // else: late straggler behind the fold high-mark, skipped
            }
            state.update(FSt(views, pairs, lastUs))
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
