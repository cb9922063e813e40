package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join at the PHYSICAL layer — the brief's preference
  * path (c): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * registered through `SparkSessionExtensions` (graft.GraftExtensions) /
  * `experimental.extraStrategies`.
  *
  * Why a physical operator when operators.AsOfJoin already answers the
  * semantics declaratively: the union+window encoding sorts the CONCATENATED
  * sides (n+m rows through one sort and one window pass, every left column
  * padded onto every right row), while this exec asks Catalyst for the two
  * children co-partitioned by key and sorted by (key, time) — the SMJ
  * contract — and then streams a single O(n+m) forward merge per partition
  * with O(1) state (the last matching payload). No padded union frame, no
  * window buffer, and EnsureRequirements elides the exchanges/sorts entirely
  * when a child is already bucketed or sorted the right way — the reuse a
  * blackbox window plan can never expose.
  *
  * Semantics (both directions, inclusive at equal times, mirroring
  * operators.AsOfJoin): backward = latest right row with rt <= lt within the
  * key; forward = earliest right row with rt >= lt. With `toleranceUs` set,
  * a match further than the bound (|lt − rt| > tol) emits the NULL payload —
  * the kdb `wj` / Pandas `merge_asof(tolerance=)` staleness semantics, one
  * extra comparison in the merge loop. Times must be non-null LongType (unix
  * micros — the house convention); a NULL time fails loudly at runtime
  * (doExecute checks every eval) instead of silently coercing to 0 and
  * matching wrongly. Right rows unique per (key, time).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean,
    toleranceUs: Option[Long] = None) extends BinaryNode {

  require(leftKeys.size == rightKeys.size, "key arity mismatch")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of times must be LongType (unix micros)")
  require(toleranceUs.forall(_ >= 0L), "as-of tolerance must be >= 0 micros")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; a no-op on every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, p, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, fwd, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean,
    toleranceUs: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // The SMJ contract: co-partition by key, sort by (key, time). Catalyst
  // inserts only the exchanges/sorts a child doesn't already satisfy.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // the merge preserves the left side's partitioning and (key, time) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val fwd = forward
    // tol < 0 ⇒ unbounded; one register comparison per emit when bounded
    val tol = toleranceUs.getOrElse(-1L)
    val payloadAttrs = payload
    val (lKeys, rKeys, lTime, rTime, out) =
      (leftKeys, rightKeys, leftTime, rightTime, output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeE = BindReferences.bindReference(lTime, lOut)
      val rTimeE = BindReferences.bindReference(rTime, rOut)
      val rPayloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      // bind the output against NULLABLE payload slots: a missed as-of emits
      // the null payload row, so reading those fields non-nullable would
      // silently produce zeros instead of NULLs
      val outProj = UnsafeProjection.create(out,
        lOut ++ payloadAttrs.map(_.withNullability(true)))
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      // the documented non-null contract fails LOUDLY: a NULL time through
      // asInstanceOf[Long] would silently become 0 and match wrongly
      def timeOf(e: Expression, row: InternalRow, side: String): Long = {
        val v = e.eval(row)
        if (v == null) throw new IllegalStateException(
          s"as-of join: NULL $side time — times must be non-null unix micros")
        v.asInstanceOf[Long]
      }

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advanceRight(): Unit =
        rRow = if (rIter.hasNext) rIter.next() else null
      // backward state: the latest matching payload, its time and its key
      // (copied — projections reuse their buffers)
      var lastKey: UnsafeRow = null
      var lastPayload: UnsafeRow = null
      var lastTime: Long = 0L

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = timeOf(lTimeE, l, "left")
        if (!fwd) {
          var scan = true
          while (scan && rRow != null) {
            val rk = rKeyProj(rRow)
            val cmp = keyOrd.compare(rk, lk)
            if (cmp < 0) advanceRight()
            else if (cmp == 0) {
              val rt = timeOf(rTimeE, rRow, "right")
              if (rt <= lt) {
                lastKey = rk.copy()
                lastPayload = rPayloadProj(rRow).copy()
                lastTime = rt
                advanceRight()
              } else scan = false
            } else scan = false
          }
          val p = if (lastKey != null && keyOrd.compare(lastKey, lk) == 0 &&
              (tol < 0L || lt - lastTime <= tol))
            lastPayload else nullPayload
          outProj(joined(l, p))
        } else {
          var scan = true
          while (scan && rRow != null) {
            val rk = rKeyProj(rRow)
            val cmp = keyOrd.compare(rk, lk)
            if (cmp < 0 ||
                (cmp == 0 && timeOf(rTimeE, rRow, "right") < lt))
              advanceRight()
            else scan = false
          }
          val p = if (rRow != null && keyOrd.compare(rKeyProj(rRow), lk) == 0 &&
              (tol < 0L || timeOf(rTimeE, rRow, "right") - lt <= tol))
            rPayloadProj(rRow) else nullPayload
          outProj(joined(l, p))
        }
      }
    }
  }
}
