package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed grouped scan must equal the window-form
  * `sum(x) OVER (PARTITION BY g ORDER BY …)` exactly, and be independent of
  * the input partitioning — the two properties that make it a drop-in,
  * scale-safe replacement for the single-task-per-group window.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks = core.table(spark, sf("sf0.001"), "documents")
    .select($"doc_id", $"lang",
      md5($"doc_id".cast("string")).as("hk"),
      length($"text").cast("long").as("v"))

  private def windowForm = {
    val w = Window.partitionBy($"lang").orderBy($"hk", $"doc_id")
    toks.withColumn("cum", sum($"v").over(w))
      .select($"doc_id", $"cum").as[(Long, Long)].collect().sorted.toSeq
  }

  test("equals the window-form running sum exactly") {
    val got = PrefixSum
      .groupedRunningTotal(toks, Seq("lang"), Seq($"hk", $"doc_id"), "v", "cum")
      .select($"doc_id", $"cum").as[(Long, Long)].collect().sorted.toSeq
    assert(got == windowForm)
  }

  test("independent of input partitioning") {
    val a = PrefixSum
      .groupedRunningTotal(toks.repartition(13), Seq("lang"), Seq($"hk", $"doc_id"), "v", "cum")
      .select($"doc_id", $"cum").as[(Long, Long)].collect().sorted.toSeq
    assert(a == windowForm)
  }

  test("rejects non-long value columns") {
    intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningTotal(
        toks.withColumn("v", $"v".cast("int")), Seq("lang"), Seq($"hk"), "v")
    }
  }
}
