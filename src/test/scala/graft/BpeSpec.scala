package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** The distributed BPE loop must learn EXACTLY the merge list a local
  * single-threaded replay learns (same argmax, same lexicographic
  * tie-break, same greedy left-to-right apply), and segmentation must be
  * lossless (symbols concat back to the word).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = core.table(spark, sf("sf0.001"), "documents")

  private lazy val freqs: Map[String, Long] =
    Bpe.wordFreqs(docs, "text").as[(String, Long)].collect().toMap

  /** Local reference BPE: same tie-break (count desc, left asc, right asc),
    * same greedy apply. */
  private def localLearn(rounds: Int): Seq[(String, String, Long)] = {
    var syms: Seq[(Vector[String], Long)] =
      freqs.toSeq.map { case (w, f) => (w.map(String.valueOf(_)).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _            =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((l, r, n))
        syms = syms.map { case (s, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
            else { b += s(i); i += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.toSeq
  }

  test("learned merges equal the local replay exactly (20 rounds)") {
    val got = Bpe.learnMerges(docs, "text", rounds = 20)
      .map(m => (m.left, m.right, m.freq))
    assert(got == localLearn(20))
    assert(got.size == 20)
  }

  test("segmentation with learned merges is lossless and strictly coarser") {
    val merges = Bpe.learnMerges(docs, "text", rounds = 10)
    val words = Bpe.wordFreqs(docs, "text").select($"w")
    val seg = words.select($"w", Bpe.segment($"w", merges).as("sym"))
      .select($"w", concat_ws("", $"sym").as("back"), size($"sym").as("n_sym"),
        length($"w").as("n_chars"))
      .as[(String, String, Int, Int)].collect()
    seg.foreach { case (w, back, nSym, nChars) =>
      assert(back == w, s"lossy segmentation of '$w'")
      assert(nSym <= nChars)
    }
    assert(seg.exists { case (_, _, nSym, nChars) => nSym < nChars },
      "at least some words must actually compress")
  }

  test("per-doc subword budgets (bpe_encode shape) are monotone in vocabulary size") {
    val m20 = Bpe.learnMerges(docs, "text", rounds = 20)
    def encode(merges: Seq[Bpe.Merge]): Map[Long, Long] =
      docs.select($"doc_id", explode(functions.ascii_tokens($"text")).as("w"))
        .select($"doc_id", size(Bpe.segment($"w", merges)).cast("long").as("n"))
        .groupBy($"doc_id").agg(sum($"n").as("t"))
        .as[(Long, Long)].collect().toMap
    val chars = docs.select($"doc_id", explode(functions.ascii_tokens($"text")).as("w"))
      .groupBy($"doc_id").agg(sum(length($"w")).cast("long").as("t"))
      .as[(Long, Long)].collect().toMap
    val e0 = encode(Nil)
    val e5 = encode(m20.take(5))
    val e20 = encode(m20)
    assert(e0 == chars, "zero merges must tokenize to exactly one symbol per char")
    assert(e5.forall { case (id, n) => n <= e0(id) }, "5 merges can never add tokens")
    assert(e20.forall { case (id, n) => n <= e5(id) }, "20 merges can never add tokens")
    assert(e20.exists { case (id, n) => n < e0(id) }, "the vocabulary must compress somewhere")
  }
}
