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
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one right payload column")
    val reserved = payload.toSet ++ Set("__side", "__payload")
    val clash = left.columns.filter(reserved)
    require(clash.isEmpty,
      s"as-of join: left columns [${clash.mkString(", ")}] collide with payload/internal names")
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))
    val otherLeft = left.columns.filterNot(c => c == leftKey || c == leftTime).toSeq
    val lAug = left
      .select((left.columns.map(col).toSeq ++ Seq(
        lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload"))): _*)
    val rAug = right.select(
      (Seq(col(rightKey).as(leftKey), col(rightTime).as(leftTime), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__payload")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = lAug.unionByName(rAug)
    val w = Window
      .partitionBy(col(leftKey))
      .orderBy(col(leftTime), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col).toSeq ++
        payload.map(p => col("__payload").getField(p).as(p))): _*)
  }
}
