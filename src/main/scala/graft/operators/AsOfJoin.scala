package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed left as-of join: for each left row, attach the payload of the
  * latest right row whose time is <= the left row's time, within the same key.
  *
  * Spark-first plan: instead of a per-key loop (the Flink-style
  * KeyedProcessFunction approach in the reference,
  * SnowflakeProcessFunction.java:88), both sides are unioned, shuffled ONCE by
  * key, sorted once by (time, side), and the right payload is carried forward
  * with a running `last(_, ignoreNulls = true)` window. O(n log n) per
  * partition, a single exchange — survives a 1000-executor scale-up as long as
  * keys hash-distribute (skewed keys fall to AQE).
  *
  * Requirements: right rows are unique per (key, time); left/right time
  * columns share a type (callers normally pass unix-micros BIGINTs); left
  * column names must be disjoint from the payload names and the internal
  * `__side`/`__payload` markers. Right rows at time == left time DO match
  * (inclusive, right sorts first).
  *
  * The payload is carried as ONE struct per right row, so a single
  * `last(_, ignoreNulls)` picks the whole matching row atomically — a
  * legitimately-NULL payload field in the matching right row stays NULL in
  * the output instead of falling back to an older right row's value (true
  * as-of semantics; per-column carry-forward would conflate "field is NULL"
  * with "no right row yet").
  */
object AsOfJoin {
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame =
    impl(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      forward = false)

  /** FORWARD as-of: attach the EARLIEST right row with time >= the left
    * row's time (the "next quote after the trade" / "first shipment after
    * the order" direction). Identical single-exchange union+window plan —
    * only the frame flips to [current, +∞) with a `first(_, ignoreNulls)`
    * carry-backward, and at equal times the left row sorts first so an
    * exactly-simultaneous right row still matches (inclusive, mirroring
    * [[leftAsOf]]). */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame =
    impl(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      forward = true)

  /** NATIVE as-of join: plans through [[graft.plans.AsOfJoinPlan]] →
    * [[graft.plans.AsOfJoinExec]] — a custom physical operator that asks
    * Catalyst for the SMJ contract (co-partitioned by key, sorted by
    * (key, time)) and streams one O(n+m) merge per partition with O(1)
    * state, instead of sorting the padded union through a window. Same
    * semantics as [[leftAsOf]]/[[leftAsOfForward]] (spec-proven equal);
    * times must be non-null LongType micros. The strategy self-registers on
    * the calling session, so no extensions config is required. */
  def leftAsOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      forward: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.graft.shims
    val spark = left.sparkSession
    shims.ensureStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    shims.ofRows(spark, graft.plans.AsOfJoinPlan(
      lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      attr(lp, leftTime), attr(rp, rightTime),
      payload.map(attr(rp, _).asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Attribute]),
      forward, toleranceUs))
  }

  private def impl(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one right payload column")
    val reserved = payload.toSet ++ Set("__side", "__payload")
    val clash = left.columns.filter(reserved)
    require(clash.isEmpty,
      s"as-of join: left columns [${clash.mkString(", ")}] collide with payload/internal names")
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))
    val otherLeft = left.columns.filterNot(c => c == leftKey || c == leftTime).toSeq
    // marker choice keeps the match INCLUSIVE at equal times in both
    // directions: backward sorts right rows first (they enter the trailing
    // frame), forward sorts left rows first (right rows stay in the leading
    // frame).
    val leftMark = if (forward) 0 else 1
    val lAug = left
      .select((left.columns.map(col).toSeq ++ Seq(
        lit(leftMark).as("__side"),
        lit(null).cast(payloadType).as("__payload"))): _*)
    val rAug = right.select(
      (Seq(col(rightKey).as(leftKey), col(rightTime).as(leftTime),
        lit(1 - leftMark).as("__side"),
        struct(payload.map(col): _*).as("__payload")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = lAug.unionByName(rAug)
    val base = Window
      .partitionBy(col(leftKey))
      .orderBy(col(leftTime), col("__side"))
    val carried =
      if (forward)
        first(col("__payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unioned
      .withColumn("__payload", carried)
      .filter(col("__side") === leftMark)
      .select((left.columns.map(col).toSeq ++
        payload.map(p => col("__payload").getField(p).as(p))): _*)
  }
}
