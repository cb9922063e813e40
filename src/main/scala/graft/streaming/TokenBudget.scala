package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-source token-budget enforcement: each source carries a running
  * token count in GroupState (O(1) per source) and emits EXACTLY ONE
  * crossing row the moment a document pushes it past its budget — the
  * token_budget_apportionment allocations enforced at ingest time (stop
  * oversampling a source the instant its budget is spent).
  *
  * Memory shape of the fold, hot-key audited in TokenBudgetSpec:
  *  - BEFORE the budget is crossed, identifying WHICH document crosses is
  *    order-dependent (the prefix sum in (hk, doc_id) order), so one key's
  *    slice of ONE micro-batch is buffered and sorted — the CepMatch
  *    buffered-batch lower bound. The buffer is bounded by the micro-batch
  *    (an ingestion knob: maxFilesPerTrigger / maxOffsetsPerTrigger), never
  *    by the stream.
  *  - AFTER the crossing, only the order-FREE running sum matters (the
  *    crossed flag makes emission once-only), so the fold degrades to a
  *    single-pass accumulation: no buffering, no sort, O(1) memory — and a
  *    budget-exhausted hot source (exactly the one that keeps spraying
  *    documents) costs nothing per batch beyond the add.
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
          // A source with no configured budget is unlimited: it still
          // accumulates (so a later budget update sees true spend) but can
          // never cross — rather than killing the task on an unknown key.
          val b = bBudgets.value.getOrElse(src, Long.MaxValue)
          if (st.crossed) {
            // order-free path: the crossing already fired, only the running
            // sum advances — single pass, no buffer, no sort
            var cum = st.cum
            it.foreach(cum += _.n_tokens)
            state.update(TState(cum, crossed = true))
            Iterator.empty
          } else {
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
}
