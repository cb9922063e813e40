package graft

import graft.functions.CountMatches
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal, Size}
import org.apache.spark.sql.catalyst.expressions.RegExpExtractAll
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Semantics-preserving rewrite: `size(regexp_extract_all(s, 'pat', 0))` →
  * [[graft.functions.CountMatches]]. Token counting is written exactly this
  * way across the text-quality surface (`text_token_count`, `text_quality`,
  * `token_chunking`, …), and the built-in plan materializes a transient
  * array<string> of every match per row only to take its length. The rewrite
  * runs the same `Matcher.find()` loop without allocating the matches — an
  * O(tokens)-allocations-per-document saving that compounds over a 100 TB
  * corpus.
  *
  * Guard rails:
  *  - only the `legacySizeOfNull = false` form of `Size` is rewritten
  *    (`size(NULL)` must stay `-1` under `spark.sql.legacy.sizeOfNull=true`,
  *    while `CountMatches` is null-propagating);
  *  - the pattern must be a non-null string literal (it compiles into the
  *    expression) and the group index the literal 0 — a non-zero group index
  *    validates the group count against the pattern and errors when out of
  *    range, behavior a pure count must not swallow.
  */
object RegexCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject, Literal(pat: UTF8String, StringType),
            Literal(0, IntegerType)), false) =>
        CountMatches(subject, pat.toString)
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — the zero-code install path
  * (SQL-only clients, Thrift server, spark-submit conf on a shared cluster):
  * injects every graft SQL function ([[graft.functions.sqlBuilders]], the
  * same list `functions.registerAll` registers on an existing session) as a
  * built-in, plus the [[RegexCountRewrite]] optimizer rule. Also applied
  * programmatically by [[GraftSession]] via `Builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.sqlBuilders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        es => b(es)))
    }
    ext.injectOptimizerRule(_ => RegexCountRewrite)
    // whole-operator custom plan: AsOfJoinPlan -> AsOfJoinExec (§2.2 as-of)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
