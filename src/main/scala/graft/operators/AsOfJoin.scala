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
  * columns share a type (callers normally pass unix-micros BIGINTs).
  * Right rows at time == left time DO match (inclusive, right sorts first).
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
    val otherLeft = left.columns.filterNot(c => c == leftKey || c == leftTime).toSeq
    val lAug = left
      .withColumn("__side", lit(1))
      .select((left.columns.map(col).toSeq ++ Seq(col("__side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val rAug = right.select(
      (Seq(col(rightKey).as(leftKey), col(rightTime).as(leftTime), lit(0).as("__side")) ++
        payload.map(col) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = lAug.unionByName(rAug)
    val w = Window
      .partitionBy(col(leftKey))
      .orderBy(col(leftTime), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
