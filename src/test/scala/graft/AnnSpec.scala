package graft

import graft.core._
import graft.operators.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall of the approximate ANN paths against the exact brute-force top-K,
  * plus exactness/determinism properties of the brute-force baseline. */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = core.table(spark, sf("sf0.01"), "embeddings")
  private lazy val queries = emb.filter($"vec_id" < 10)
  private lazy val cands = emb.filter($"vec_id" >= 10)

  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallVsExact(approx: DataFrame, k: Int): Double = {
    val exact = topkSets(Ann.bruteForceTopK(queries, cands, k))
    val got = topkSets(approx)
    val per = exact.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("brute-force top-k is deterministic and correctly ranked") {
    val r1 = Ann.bruteForceTopK(queries, cands, 5).collect()
    val r2 = Ann.bruteForceTopK(queries, cands, 5).collect()
    assert(r1.toSeq == r2.toSeq)
    // ranks within each query strictly ordered by (cosine desc, neighbor_id)
    r1.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          val (ch, cl) = (hi.getDouble(3), lo.getDouble(3))
          assert(ch > cl || (ch == cl && hi.getLong(2) < lo.getLong(2)))
        case _ =>
      }
    }
  }

  test("LSH ANN recall@5 beats random-candidate baseline by a wide margin") {
    val recall = recallVsExact(Ann.lshTopK(queries, cands, 5), 5)
    // 490 candidates, top-5: random buckets would land ~1% recall.
    assert(recall >= 0.3, s"LSH recall@5 = $recall")
  }

  test("IVF ANN recall@5 beats random-candidate baseline by a wide margin") {
    val recall = recallVsExact(
      Ann.ivfTopK(queries, cands, Ann.centroids(emb), 5), 5)
    assert(recall >= 0.3, s"IVF recall@5 = $recall")
  }

  test("SRP-banded pairs recall a majority of the exact tau-pairs") {
    val exact = Ann.pairsAboveThreshold(emb, 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val banded = Ann.lshPairs(emb, 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(exact), "banded pairs must be exact-verified")
    val recall = banded.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"banded pair recall = $recall")
  }

  test("pairsAboveThreshold matches per-pair cosine recomputation") {
    val rows = Ann.pairsAboveThreshold(emb, 0.45).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.45))
  }
}
