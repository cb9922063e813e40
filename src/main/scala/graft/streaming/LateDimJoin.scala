package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream–dimension join that tolerates LATE dimensions: facts whose
  * dimension row hasn't arrived yet buffer in keyed state and re-emit
  * enriched the moment it lands — the classic CDC race (fact feed outruns
  * the dim feed) that a plain stream–static join answers with dropped or
  * null-padded rows. The reference joins its stream against Snowflake-read
  * dimensions and simply assumes they're present
  * (SnowflakeProcessFunction.java); this operator is what that topology
  * needs once the dim itself is a lagging stream.
  *
  * State per key = the dim attributes (once known) + ONLY the still-unmatched
  * facts; a dim arrival drains the key's buffer immediately, so steady-state
  * memory is O(in-flight race window), not O(history). Within a micro-batch
  * dims apply before facts (kind-sorted: "d" < "f"), so a fact landing in
  * the same batch as its dim joins without touching state.
  */
object LateDimJoin {

  /** Unioned input: kind = "d" (dim: user_id, segment) | "f" (fact). */
  case class In(kind: String, user_id: Long, event_id: Long, value_c: Long,
      segment: String)
  case class FactRec(event_id: Long, value_c: Long)
  case class BState(segment: Option[String], pending: Seq[FactRec])
  case class Out(event_id: Long, user_id: Long, value_c: Long, segment: String,
      was_buffered: Boolean)

  def joined(mixed: DataFrame): Dataset[Out] = {
    import mixed.sparkSession.implicits._
    mixed.selectExpr("kind", "user_id", "event_id", "value_c", "segment").as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[In], state: GroupState[BState]) =>
          val prior = state.getOption.getOrElse(BState(None, Seq.empty))
          var seg: Option[String] = prior.segment
          var pending: Seq[FactRec] = prior.pending
          val out = scala.collection.mutable.ArrayBuffer.empty[Out]
          it.toSeq.sortBy(r => (r.kind, r.event_id)).foreach { r =>
            if (r.kind == "d") {
              seg = Some(r.segment)
              pending.foreach(f =>
                out += Out(f.event_id, user, f.value_c, r.segment, was_buffered = true))
              pending = Seq.empty
            } else seg match {
              case Some(sg) =>
                out += Out(r.event_id, user, r.value_c, sg, was_buffered = false)
              case None =>
                pending = pending :+ FactRec(r.event_id, r.value_c)
            }
          }
          state.update(BState(seg, pending))
          out.iterator
      }
  }
}
