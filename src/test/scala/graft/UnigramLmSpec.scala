package graft

import graft.functions.{unigram_viterbi, UnigramVocab}
import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

/** The unigram-LM tokenizer (r16, VERDICT r15 "Next round" #5): Viterbi
  * segmentation must be globally OPTIMAL (proved against brute-force
  * enumeration of every segmentation), tie-breaks and the EM loop must be
  * deterministic, segmentation must be lossless, and the integer-e6 log
  * score must refuse counts outside its exhaustively-validated domain.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = core.table(spark, sf("sf0.001"), "documents")

  private def viterbi(word: String, vocab: UnigramVocab): (Seq[String], Long) = {
    val r = Seq(word).toDF("w")
      .select(unigram_viterbi($"w", vocab).as("g"))
      .select($"g.ps", $"g.score_e6").as[(Seq[String], Long)].head()
    r
  }

  /** Every segmentation of `w` into vocab pieces of length ≤ maxLen. */
  private def allSegs(w: String, scores: Map[String, Long], maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      val head = w.substring(0, l)
      if (scores.contains(head)) allSegs(w.substring(l), scores, maxLen).map(head +: _)
      else Seq.empty
    }

  test("Viterbi is globally optimal vs brute-force enumeration, with the (score, longest-last-piece) tie-break") {
    val scores = Map(
      "a" -> -500000L, "b" -> -700000L, "c" -> -900000L,
      "ab" -> -1000000L, "bc" -> -1500000L, "abc" -> -2100000L,
      "ca" -> -1600000L, "aa" -> -1000000L)
    val vocab = new UnigramVocab(
      scores.keys.toArray.sorted, scores.keys.toArray.sorted.map(scores), 3)
    for (w <- Seq("abc", "abcabc", "aaaa", "cab", "bcaabc", "a", "ccc", "abcaabca")) {
      val (ps, sc) = viterbi(w, vocab)
      assert(ps.mkString == w, s"lossless: $w -> $ps")
      val best = allSegs(w, scores, 3).map(s => (s, s.map(scores).sum))
      assert(best.nonEmpty)
      val maxScore = best.map(_._2).max
      assert(sc == maxScore, s"$w: engine $sc vs brute-force $maxScore")
      // tie-break: among max-score segmentations the engine's pick is the
      // one whose pieces are longest-first greedily from the END (smallest
      // split point per DP step) — equivalently lexicographically FIRST by
      // reversed piece-length sequence descending. Verify it is one of the
      // optimal segmentations and matches the DP replay below.
      assert(best.filter(_._2 == maxScore).map(_._1).contains(ps))
      // local DP replay with the exact tie-break rule
      val n = w.length
      val dp = Array.fill(n + 1)(Long.MinValue); dp(0) = 0L
      val back = Array.fill(n + 1)(-1)
      for (i <- 1 to n; j <- math.max(0, i - 3) until i) {
        if (dp(j) != Long.MinValue) scores.get(w.substring(j, i)).foreach { s =>
          if (dp(j) + s > dp(i)) { dp(i) = dp(j) + s; back(i) = j }
        }
      }
      val expected = {
        val b = List.newBuilder[String]
        var p = n
        var acc = List.empty[String]
        while (p > 0) { acc = w.substring(back(p), p) :: acc; p = back(p) }
        b ++= acc
        b.result()
      }
      assert(ps == expected, s"$w: tie-break $ps vs $expected")
    }
  }

  test("a missing character fails LOUDLY, not silently") {
    val vocab = new UnigramVocab(Array("a", "b"), Array(-1000000L, -1000000L), 3)
    val e = intercept[Exception] { viterbi("abz", vocab) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no segmentation")), e.getMessage)
  }

  test("lnE6 refuses counts outside the exhaustively-validated domain") {
    assert(UnigramLm.lnE6(1L) == 0L)
    assert(UnigramLm.lnE6(2L) == 693147L) // round(ln(2)*1e6)
    intercept[IllegalArgumentException] { UnigramLm.lnE6(0L) }
    intercept[IllegalArgumentException] { UnigramLm.lnE6(UnigramLm.LnDomainMax + 1) }
  }

  test("EM training is deterministic and the learned vocabulary is well-formed") {
    val v1 = UnigramLm.learn(docs, "text", maxPieceLen = 4, seedMulti = 50, rounds = 2)
    val v2 = UnigramLm.learn(docs, "text", maxPieceLen = 4, seedMulti = 50, rounds = 2)
    assert(v1 == v2, "rerun must learn the identical vocabulary")
    // single-char coverage: every char of the corpus alphabet survives
    val alphabet = docs.select(explode(graft.functions.ascii_tokens($"text")).as("w"))
      .select(explode(graft.functions.char_split($"w")).as("c"))
      .distinct().as[String].collect().toSet
    val single = v1.filter(_.piece.length == 1).map(_.piece).toSet
    assert(alphabet.subsetOf(single), s"missing chars: ${alphabet -- single}")
    // scores are negative logs; pieces with larger counts score higher
    assert(v1.forall(_.scoreE6 < 0))
    val byCount = v1.sortBy(_.n)
    byCount.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo.scoreE6 <= hi.scoreE6 || lo.n == hi.n)
      case _           =>
    }
    // multi-char pieces kept only while used
    assert(v1.filter(_.piece.length > 1).forall(_.n > 0))
  }

  test("encode census is lossless in chars and consistent with the vocabulary scores") {
    val vocab = UnigramLm.learn(docs, "text", maxPieceLen = 4, seedMulti = 50, rounds = 2)
    val enc = UnigramLm.encode(docs, "text", vocab, maxPieceLen = 4)
    val row = enc.agg(sum($"n_chars"), sum($"n_pieces"), sum($"n_words")).head()
    val chars = docs.select(explode(graft.functions.ascii_tokens($"text")).as("w"))
      .agg(sum(length($"w"))).head().getLong(0)
    assert(row.getLong(0) == chars, "n_chars must equal the corpus [a-z]+ char count")
    assert(row.getLong(1) <= row.getLong(0) && row.getLong(1) >= row.getLong(2),
      "pieces bounded by chars below and words above")
    // ll_e6 equals re-scoring the pieces with the vocab map
    val scores = vocab.map(p => p.piece -> p.scoreE6).toMap
    val uv = UnigramLm.toVocab(vocab, 4)
    val sample = docs.limit(20)
    val engine = UnigramLm.encode(sample, "text", vocab, maxPieceLen = 4)
      .select($"doc_id", $"ll_e6").as[(Long, Long)].collect().toMap
    val replay = sample.select($"doc_id", explode(graft.functions.ascii_tokens($"text")).as("w"))
      .select($"doc_id", unigram_viterbi($"w", uv)("ps").as("ps"))
      .as[(Long, Seq[String])].collect()
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).map(scores).sum).toMap
    assert(engine == replay)
  }
}
