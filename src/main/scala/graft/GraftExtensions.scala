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

/** Parser extension — the fourth Spark extension point beside the injected
  * functions, the [[RegexCountRewrite]] optimizer rule, and the
  * [[graft.plans.AsOfJoinStrategy]] planner strategy: a ONE-statement SQL
  * dialect addition
  *
  *   GRAFT DEDUP <table> THRESHOLD <tau>
  *
  * that plans straight into the banded MinHash near-dup pipeline
  * (operators.NearDup.minhashLshPairs) over the named table — the
  * whole-OPERATOR SQL surface for clients that only speak SQL (Thrift
  * server, notebooks). Everything that doesn't match the statement shape
  * delegates verbatim to Spark's parser, so the dialect is purely additive;
  * the statement resolves its table through the active session's catalog
  * (temp views included) and returns the pair plan ((id_a, id_b, jaccard
  * verdict columns) exactly as the DataFrame API emits them.
  */
class GraftSqlParser(delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  import org.apache.spark.sql.catalyst.parser.ParserInterface
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private val DedupStmt =
    """(?is)\s*GRAFT\s+DEDUP\s+([A-Za-z_][A-Za-z0-9_.]*)\s+THRESHOLD\s+([0-9]*\.?[0-9]+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DedupStmt(tableName, tau) =>
      val spark = org.apache.spark.sql.SparkSession.active
      graft.operators.NearDup
        .minhashLshPairs(spark.table(tableName), tau.toDouble)
        .queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String) = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String) = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String) = delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String) = delegate.parseQuery(s)
  override def parseRoutineParam(s: String) = delegate.parseRoutineParam(s)
  override def parseDataType(s: String) = delegate.parseDataType(s)
  override def parseTableSchema(s: String) = delegate.parseTableSchema(s)
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
    // one-statement dialect: GRAFT DEDUP <table> THRESHOLD <tau>
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
