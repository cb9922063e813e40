package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.functions._

/** Contiguity + determinism of the distributed global index: indices are
  * exactly 0..n-1, follow the requested total order, and survive arbitrary
  * input repartitioning unchanged (the property a single-partition
  * row_number window gives up at scale).
  */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = core.table(spark, sf("sf0.001"), "documents")
    .select($"doc_id", md5($"doc_id".cast("string")).as("k"))

  test("indices are contiguous 0..n-1 and follow the total order") {
    val idx = GlobalOrder.withGlobalIndex(docs, Seq($"k", $"doc_id"))
    val rows = idx.orderBy($"row_idx").select($"k", $"doc_id", $"row_idx")
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._3).toSeq == (0L until rows.length).toSeq)
    val keys = rows.map(r => (r._1, r._2)).toSeq
    assert(keys == keys.sorted, "row_idx order must equal the (k, doc_id) total order")
  }

  test("index is independent of input partitioning") {
    val a = GlobalOrder.withGlobalIndex(docs.repartition(7), Seq($"k", $"doc_id"))
      .select($"doc_id", $"row_idx").as[(Long, Long)].collect().sorted.toSeq
    val b = GlobalOrder.withGlobalIndex(docs.coalesce(1), Seq($"k", $"doc_id"))
      .select($"doc_id", $"row_idx").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
