package graft

import graft.functions.topk_pairs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-state TopKPairs aggregate must equal the row_number-window
  * form in both rank modes, independently of input partitioning (partial /
  * merge / serialize paths), with deterministic tie handling, and must
  * actually run as a partial-aggregated ObjectHashAggregate rather than a
  * window sort.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = core.eventsTable(spark, sf("sf0.001"))
    .select($"event_type", $"event_id",
      ($"value".cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
        .cast("long").as("p"))

  private def viaAgg(df: DataFrame, k: Int, desc: Boolean): Seq[(String, Long, Long)] =
    df.groupBy($"event_type")
      .agg(topk_pairs($"p", $"event_id", k, desc).as("tk"))
      .select($"event_type", explode($"tk").as("e"))
      .select($"event_type", $"e.p", $"e.v")
      .as[(String, Long, Long)].collect().toSeq
      .sortBy(identity)

  private def viaWindow(df: DataFrame, k: Int, desc: Boolean): Seq[(String, Long, Long)] = {
    val ord = if (desc) Seq($"p".desc, $"event_id".asc) else Seq($"p".asc, $"event_id".asc)
    df.withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy(ord: _*)))
      .filter($"rn" <= k)
      .select($"event_type", $"p", $"event_id")
      .as[(String, Long, Long)].collect().toSeq
      .sortBy(identity)
  }

  test("equals the row_number window in both rank modes") {
    assert(viaAgg(ev, 5, desc = true) == viaWindow(ev, 5, desc = true))
    assert(viaAgg(ev, 7, desc = false) == viaWindow(ev, 7, desc = false))
  }

  test("result is independent of input partitioning (partial/merge/serde paths)") {
    val one = viaAgg(ev.repartition(1), 5, desc = true)
    val many = viaAgg(ev.repartition(13), 5, desc = true)
    assert(one == many)
  }

  test("k larger than the group returns the whole group in rank order") {
    val df = Seq(("a", 3L, 30L), ("a", 1L, 10L), ("b", 2L, 20L))
      .toDF("event_type", "p", "event_id")
    assert(viaAgg(df, 100, desc = false) ==
      Seq(("a", 1L, 10L), ("a", 3L, 30L), ("b", 2L, 20L)))
  }

  test("equal priorities break ties by value ascending in both modes") {
    val df = Seq(("g", 7L, 5L), ("g", 7L, 1L), ("g", 7L, 3L), ("g", 7L, 9L))
      .toDF("event_type", "p", "event_id")
    // rank order keeps the SMALLEST values on ties, regardless of mode
    assert(viaAgg(df, 2, desc = false).map(_._3) == Seq(1L, 3L))
    assert(viaAgg(df, 2, desc = true).map(_._3) == Seq(1L, 3L))
  }

  test("null priorities and values are skipped") {
    val df = Seq(("g", Some(1L), Some(10L)), ("g", None, Some(20L)),
        ("g", Some(2L), None), ("g", Some(3L), Some(30L)))
      .toDF("event_type", "p", "event_id")
    assert(viaAgg(df, 10, desc = false) == Seq(("g", 1L, 10L), ("g", 3L, 30L)))
  }

  test("plan audit: partial-aggregated ObjectHashAggregate, no Window, no full sort") {
    val plan = ev.groupBy($"event_type")
      .agg(topk_pairs($"p", $"event_id", 5, descending = true).as("tk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topk_pairs"),
      s"map-side partial aggregation missing:\n$plan")
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }
}
