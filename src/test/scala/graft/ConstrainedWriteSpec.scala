package graft

import graft.sinks.{ConstrainedWrite, GraftTableWriter, VersionedTable}
import org.apache.spark.sql.functions._

/** ConstrainedWrite: the fork never loses or duplicates a row, constraint
  * order decides multi-violation ties, and the streaming variant is
  * idempotent per batchId on both sides (the crash-replay contract).
  */
class ConstrainedWriteSpec extends SparkSpec {
  import spark.implicits._

  private val constraints = Seq(
    "v_pos" -> (col("v") > 0),
    "k_small" -> (col("k") < 100L))

  test("fork partitions the batch exactly; first violated constraint wins") {
    val base = "/tmp/graft_cw_spec_batch"
    GraftTableWriter.drop(spark, s"$base/t"); GraftTableWriter.drop(spark, s"$base/q")
    // k=7: clean; k=101: k_small; v=-1: v_pos; k=200,v=-5: BOTH -> v_pos
    val df = Seq((7L, 1L), (101L, 2L), (8L, -1L), (200L, -5L)).toDF("k", "v")
    val (acc, quar) = ConstrainedWrite.append(df, s"$base/t", s"$base/q", constraints)
    assert((acc, quar) == (1L, 3L))
    val got = VersionedTable.read(spark, s"$base/t").as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 1L)), s"accepted rows wrong: $got")
    val q = spark.read.parquet(s"$base/q")
      .select($"k", $"_violated").as[(Long, String)].collect().toSet
    assert(q == Set((101L, "k_small"), (8L, "v_pos"), (200L, "v_pos")),
      s"quarantine wrong: $q")
  }

  test("appendOnce: a replayed batch lands zero duplicates on either side") {
    val base = "/tmp/graft_cw_spec_once"
    GraftTableWriter.drop(spark, s"$base/t"); GraftTableWriter.drop(spark, s"$base/q")
    val b0 = Seq((1L, 5L), (2L, -3L)).toDF("k", "v")
    ConstrainedWrite.appendOnce(b0, s"$base/t", s"$base/q", 0L, constraints)
    // crash-replay of the SAME batch id: both sides must be unchanged
    ConstrainedWrite.appendOnce(b0, s"$base/t", s"$base/q", 0L, constraints)
    val b1 = Seq((3L, 7L)).toDF("k", "v")
    ConstrainedWrite.appendOnce(b1, s"$base/t", s"$base/q", 1L, constraints)
    val got = VersionedTable.read(spark, s"$base/t").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 5L), (3L, 7L)), s"accepted after replay: $got")
    val q = spark.read.parquet(s"$base/q").select($"k").as[Long].collect().toSeq
    assert(q == Seq(2L), s"quarantine after replay: $q")
  }
}
