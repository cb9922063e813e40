package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-source token-budget enforcement: each source carries a running
  * token count in GroupState (O(1) per source) and emits EXACTLY ONE
  * crossing row the moment a document pushes it past its budget — the
  * token_budget_apportionment allocations enforced at ingest time (stop
  * oversampling a source the instant its budget is spent). Folds each
  * micro-batch in (hk, doc_id) order (the CepMatch buffered-batch lower
  * bound); the crossed flag in state makes the emission once-only across
  * batches.
  */
object TokenBudget {

  case class DocIn(doc_id: Long, source: String, n_tokens: Long, hk: String)
  case class TState(cum: Long, crossed: Boolean)
  case class Crossing(source: String, crossing_doc_id: Long, cum_tokens: Long,
      budget: Long)

  def crossings(docs: DataFrame, budgets: Map[String, Long]): Dataset[Crossing] = {
    import docs.sparkSession.implicits._
    val bBudgets = docs.sparkSession.sparkContext.broadcast(budgets)
    docs.selectExpr("doc_id", "source", "n_tokens", "hk")
      .as[DocIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[DocIn], state: GroupState[TState]) =>
          var st = state.getOption.getOrElse(TState(0L, false))
          val b = bBudgets.value(src)
          val batch = it.toArray
          java.util.Arrays.sort(batch,
            Ordering.by((r: DocIn) => (r.hk, r.doc_id)))
          val out = scala.collection.mutable.ArrayBuffer.empty[Crossing]
          batch.foreach { r =>
            val next = st.cum + r.n_tokens
            if (!st.crossed && next >= b)
              out += Crossing(src, r.doc_id, next, b)
            st = TState(next, st.crossed || next >= b)
          }
          state.update(st)
          out.iterator
      }
  }
}
