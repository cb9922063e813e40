package graft.operators

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the tokenizer-
  * training step of an LLM data pipeline, over the corpus word-frequency
  * table.
  *
  * Scale shape per merge round: ONE shuffle (adjacent-pair counts grouped by
  * pair, partial-aggregated map-side) + a driver argmax of a single row; the
  * symbol table then advances with one [[graft.functions.MergePair]]
  * projection (no shuffle — the merge pair rides into codegen as reference
  * objects). Driver state is O(rounds) merges; the word table itself — the
  * thing that is corpus-sized — never leaves executors. `localCheckpoint`
  * truncates the per-round lineage, the same pattern as
  * [[NearDup.connectedComponents]].
  *
  * Deterministic: the argmax orders by (count DESC, left, right), so ties
  * break lexicographically; reruns learn the identical merge list (asserted
  * in BpeSpec against a local replay).
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** The corpus word-frequency table (one shuffle by word). */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(ascii_tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = wordFreqs(docs, textCol)
      .select($"freq", char_split($"w").as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = syms
        .select($"freq", explode(filter(
          zip_with($"sym", slice($"sym", 2, 1000000),
            (a, b) => struct(a.as("l"), b.as("r"))),
          p => p.getField("r").isNotNull)).as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"freq").as("n"))
        .orderBy(desc("n"), $"l", $"r")
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, n) = top.head
        merges += Merge(r, l, rt, n)
        syms = syms.select($"freq", merge_pair($"sym", l, rt).as("sym"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq
  }

  /** Segment a word column with a learned merge list: char split, then each
    * merge in rank order — a fixed chain of `rounds` codegen'd projections. */
  def segment(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(char_split(word)) { (c, m) =>
      merge_pair(c, m.left, m.right)
    }
}
