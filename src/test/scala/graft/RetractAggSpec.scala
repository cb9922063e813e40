package graft

import graft.operators.RetractAgg
import graft.sinks.{GraftTableWriter, VersionedTable}

/** Retract-aggregate semantics ([[RetractAgg.applyBatch]]): updates retract
  * the key's old contribution, stale replays lose to the logical clock, and
  * the agg-before-replica commit order makes a crash between the two
  * commits converge on replay (the claim the operator's doc makes).
  */
class RetractAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("user_id", "event_type")

  private def setup(tag: String): (String, String) = {
    val rep = s"/tmp/graft_tables/spec_retract_rep_$tag"
    val agg = s"/tmp/graft_tables/spec_retract_agg_$tag"
    GraftTableWriter.drop(spark, rep); GraftTableWriter.drop(spark, agg)
    VersionedTable.overwrite(
      Seq.empty[(Long, String, Long, Long)].toDF("user_id", "event_type", "event_id", "v_c"), rep)
    VersionedTable.overwrite(
      Seq.empty[(Long, Long, Long)].toDF("user_id", "sum_v_c", "n_types"), agg)
    (rep, agg)
  }

  private def batch(rows: (Long, String, Long, Long)*) =
    rows.toDF("user_id", "event_type", "event_id", "v_c")

  private def aggRows(p: String) =
    VersionedTable.read(spark, p).as[(Long, Long, Long)].collect().toSet
  private def repRows(p: String) =
    VersionedTable.read(spark, p).as[(Long, String, Long, Long)].collect().toSet

  test("updates retract the old contribution; stale replays lose to the clock") {
    val (rep, agg) = setup("a")
    RetractAgg.applyBatch(spark,
      batch((1L, "x", 10L, 100L), (1L, "y", 11L, 7L), (2L, "x", 12L, 50L)),
      rep, agg, keys, batchId = 1)
    assert(aggRows(agg) == Set((1L, 107L, 2L), (2L, 50L, 1L)))
    // key (1,x) updates 100 -> 40 (retract 100, add 40); the (2,x) row is a
    // STALE replay (older event_id) and must change nothing
    RetractAgg.applyBatch(spark,
      batch((1L, "x", 20L, 40L), (2L, "x", 5L, 999L)),
      rep, agg, keys, batchId = 2)
    assert(aggRows(agg) == Set((1L, 47L, 2L), (2L, 50L, 1L)))
    assert(repRows(rep) == Set((1L, "x", 20L, 40L), (1L, "y", 11L, 7L), (2L, "x", 12L, 50L)))
  }

  test("crash between agg and replica commits converges on replay") {
    val (rep, agg) = setup("b")
    RetractAgg.applyBatch(spark, batch((1L, "x", 10L, 100L)), rep, agg, keys, batchId = 1)
    val afterB1Rep = repRows(rep)
    // batch 2 dies BETWEEN the two commits: agg moved, replica did not
    val e = intercept[RuntimeException] {
      RetractAgg.applyBatch(spark, batch((1L, "x", 20L, 40L)), rep, agg, keys,
        batchId = 2, crashBetweenCommits = () => throw new RuntimeException("injected"))
    }
    assert(e.getMessage == "injected")
    assert(aggRows(agg) == Set((1L, 40L, 1L)), "agg commit landed before the crash")
    assert(repRows(rep) == afterB1Rep, "replica commit must not have landed")
    // replay: deltas recompute from the UNCHANGED replica, the agg's
    // batch-id skip suppresses the double-apply, the replica catches up
    RetractAgg.applyBatch(spark, batch((1L, "x", 20L, 40L)), rep, agg, keys, batchId = 2)
    assert(aggRows(agg) == Set((1L, 40L, 1L)))
    assert(repRows(rep) == Set((1L, "x", 20L, 40L)))
    // the pipeline keeps going after recovery
    RetractAgg.applyBatch(spark, batch((1L, "y", 30L, 5L)), rep, agg, keys, batchId = 3)
    assert(aggRows(agg) == Set((1L, 45L, 2L)))
  }
}
