package graft

import org.apache.spark.sql.functions._

/** Streaming CEP vs the batch strict-contiguity window: output equality on
  * real data, plus proof that the corpus actually exercises the cross-batch
  * path (matches whose view and purchase land in DIFFERENT staged slices) —
  * without which the O(1)-state-across-batches claim would be untested.
  */
class CepSpec extends SparkSpec {
  import spark.implicits._

  test("streaming CEP ≡ batch window build, and cross-batch matches fire") {
    val d = sf("sf0.001")
    val batch = SparkEntry.queries("cep_pattern_match")(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    val streamed = SparkEntry.queries("streaming_cep")(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size} users")

    // the staged slices cut on event_id quartiles; a match spans batches
    // when its view and purchase fall in different slices
    val ev = core.eventsTable(spark, d)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"event_id", core.micros($"ts").as("us"), $"event_type")
    val mx = ev.agg(max($"event_id")).head.getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val spanning = ev
      .withColumn("t1", lead($"event_type", 1).over(w))
      .withColumn("t2", lead($"event_type", 2).over(w))
      .withColumn("u2", lead($"us", 2).over(w))
      .withColumn("id2", lead($"event_id", 2).over(w))
      .filter($"event_type" === "view" && $"t1" === "click" &&
        $"t2" === "purchase" && $"u2" - $"us" <= 86400000000L)
      .withColumn("slice_a", floor(($"event_id" - 1) / lit(math.max(mx / 4, 1L))))
      .withColumn("slice_b", floor(($"id2" - 1) / lit(math.max(mx / 4, 1L))))
      .filter($"slice_a" =!= $"slice_b")
      .count()
    assert(spanning > 0,
      "no match spans a batch boundary at sf0.001 — the cross-batch state " +
        "path is untested by this corpus")
  }
}
