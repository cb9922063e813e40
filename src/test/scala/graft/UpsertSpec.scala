package graft

import graft.sinks.GraftTableWriter
import org.apache.spark.sql.functions._

/** The version-aware upsert must converge to the same table whatever order
  * the update batches arrive in — the property the streaming CDC pipeline
  * relies on (micro-batch order is not contractual). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsertVersioned is arrival-order independent") {
    val batches = Seq(
      Seq((1L, "a", 10L, 1.0), (2L, "a", 11L, 2.0)),
      Seq((1L, "a", 30L, 3.0), (3L, "b", 12L, 4.0)),
      Seq((1L, "a", 20L, 5.0), (2L, "a", 25L, 6.0)))
      .map(_.toDF("user_id", "event_type", "event_id", "value"))
    val keys = Seq("user_id", "event_type")
    def runOrder(order: Seq[Int], path: String): Set[(Long, String, Long, Double)] = {
      GraftTableWriter.drop(spark, path)
      order.foreach(i => GraftTableWriter.upsertVersioned(
        batches(i), path, keys, Seq(col("event_id").desc)))
      spark.read.parquet(path).as[(Long, String, Long, Double)].collect().toSet
    }
    val fwd = runOrder(Seq(0, 1, 2), "/tmp/graft_tables/spec_uv_fwd")
    val rev = runOrder(Seq(2, 1, 0), "/tmp/graft_tables/spec_uv_rev")
    val expected = Set(
      (1L, "a", 30L, 3.0), // max event_id wins regardless of batch order
      (2L, "a", 25L, 6.0),
      (3L, "b", 12L, 4.0))
    assert(fwd == expected && rev == expected)
  }
}
