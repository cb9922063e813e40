package graft

import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** Curation-operator proofs: the prefix-filtered containment join equals the
  * brute-force all-ordered-pairs containment (the filters are lossless, not
  * heuristic), containment is asymmetric in the direction the operator
  * claims (subset → superset scores 10⁶), and the Gopher rule battery's
  * flags recompute from its own emitted statistics.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with a known subset/superset pair: doc 2 is a strict prefix
  // of doc 1, doc 3 is unrelated, doc 4 = doc 3 with one extra word.
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta"),
    (3L, "one two three four five six seven eight"),
    (4L, "one two three four five six seven eight nine")
  ).toDF("doc_id", "text")

  /** all ordered pairs, exact shingle containment, no filters anywhere */
  private def brute(minContE6: Long): Set[(Long, Long, Long, Long, Long)] = {
    val sets = NearDup.shingled(corpus)
      .as[(Long, Seq[String])].collect().toMap
    (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      common = sa.toSet.intersect(sb.toSet).size.toLong
      cont = common * 1000000L / sa.size
      if cont >= minContE6
    } yield (a, b, common, sa.size.toLong, cont)).toSet
  }

  test("containment join equals brute force on the handcrafted corpus") {
    val got = NearDup.containmentPairs(corpus, 500000L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == brute(500000L), s"got $got\nwant ${brute(500000L)}")
  }

  test("containment join equals brute force on sf0.001 documents") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sets = NearDup.shingled(docs).as[(Long, Seq[String])].collect().toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      common = sa.toSet.intersect(sb.toSet).size.toLong
      cont = common * 1000000L / sa.size
      if cont >= 500000L
    } yield (a, b)).toSet
    val got = NearDup.containmentPairs(docs, 500000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("containment is asymmetric: strict subset scores 1e6, superset less") {
    val got = NearDup.containmentPairs(corpus, 100000L)
      .select("id_a", "id_b", "cont_e6").as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // doc 2's shingles are a strict subset of doc 1's → containment 2→1 = 1.0
    assert(got((2L, 1L)) == 1000000L)
    assert(got((1L, 2L)) < 1000000L)
    assert(got((4L, 3L)) < got((3L, 4L)),
      "the smaller doc must be better-contained in the larger")
  }

  test("gopher battery: flags recompute from the emitted statistics") {
    val rows = graft.SparkEntry.queries("gopher_quality_filters")(spark, sf("sf0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val meanE3 = r.getAs[Long]("mean_len_e3")
      val maxE6 = r.getAs[Long]("max_frac_e6")
      val nStop = r.getAs[Long]("n_stop")
      assert(r.getAs[Long]("f_words") == (if (nWords >= 20) 1L else 0L))
      assert(r.getAs[Long]("f_mean_len") == (if (meanE3 >= 3000 && meanE3 <= 10000) 1L else 0L))
      assert(r.getAs[Long]("f_stop") == (if (nStop >= 2) 1L else 0L))
      assert(r.getAs[Long]("f_repetition") == (if (maxE6 <= 120000) 1L else 0L))
      assert(r.getAs[Long]("mean_len_e3") == 1000L * r.getAs[Long]("n_tok_chars") / math.max(nWords, 1L))
      assert(r.getAs[Long]("keep") ==
        r.getAs[Long]("f_words") * r.getAs[Long]("f_mean_len")
          * r.getAs[Long]("f_stop") * r.getAs[Long]("f_repetition"))
    }
  }

  test("bigram PMI matches a naive local recompute on sf0.001") {
    val got = graft.SparkEntry.queries("bigram_pmi")(spark, sf("sf0.001"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    val texts = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("text").as[String].collect()
    val docTokens = texts.map(t => "[a-z]+".r.findAllIn(t.toLowerCase).toVector)
    val uni = docTokens.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigrams = docTokens.flatMap(w => w.zip(w.drop(1)))
    val nb = bigrams.size.toLong
    val want = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 5L)
      .map { case ((a, b), cxy) =>
        (a, b, cxy, uni(a), uni(b), 1000000L * cxy * nb / (uni(a) * uni(b)))
      }.toSeq
      .sortBy { case (a, b, _, _, _, p) => (-p, a, b) }
      .take(100)
    assert(got.toSeq == want)
  }

  test("source_mix_hhi matches a naive local recompute and its bounds") {
    val got = graft.SparkEntry.queries("source_mix_hhi")(spark, sf("sf0.001"))
      .as[(String, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("lang", "source").as[(String, String)].collect()
    val want = docs.groupBy(_._1).map { case (lang, ds) =>
      val bySrc = ds.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = ds.size.toLong
      val sumC2 = bySrc.values.map(c => BigInt(c) * c).sum
      (lang, n, bySrc.size.toLong, 1000000L * bySrc.values.max / n,
        (BigInt(1000000000000L) * sumC2 / (BigInt(n) * n)).toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    got.foreach { case (_, _, nSrc, topE6, hhiE12) =>
      // HHI bounds: 1/n_sources ≤ HHI ≤ 1, and top-share² ≤ HHI (floor slack)
      assert(hhiE12 >= 1000000000000L / nSrc - 1 && hhiE12 <= 1000000000000L)
      assert(BigInt(topE6) * topE6 <= BigInt(hhiE12) + 1,
        "top_share^2 (e12) must lower-bound the HHI")
    }
  }

  test("token_diversity matches a naive local recompute on sf0.001") {
    val got = graft.SparkEntry.queries("token_diversity")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = docs.map { case (id, t) =>
      val toks = "[a-z]+".r.findAllIn(t.toLowerCase).toVector
      val c = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val s = toks.size.toLong
      val sumC2 = c.values.map(x => x * x).sum
      (id, s, c.size.toLong, 1000000L * c.size / s, 1000000L - 1000000L * sumC2 / (s * s))
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("shingle_novelty: min-doc attribution equals the local replay") {
    val got = graft.SparkEntry.queries("shingle_novelty")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val w = "[a-z]+".r.findAllIn(t.toLowerCase).toVector
      (0 until math.max(w.size - 2, 1)).map { i =>
        (0 to 2).map(k => if (i + k < w.size) w(i + k) else "").mkString(" ")
      }.toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    val firstDoc = sh.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = sh.map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g) == id).toLong
      (id, gs.size.toLong, novel, 1000000L * novel / gs.size)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the smallest doc_id is by definition all-novel
    assert(got.minBy(_._1)._4 == 1000000L)
    // every first occurrence is attributed exactly once across the corpus
    assert(got.map(_._3).sum == firstDoc.size.toLong)
  }

  test("vocab_coverage matches a local top-25 recompute and the cap binds") {
    val got = graft.SparkEntry.queries("vocab_coverage")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> "[a-z]+".r.findAllIn(t.toLowerCase).toVector }
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(25).map(_._1).toSet
    val want = toks.map { case (id, ws) =>
      val n = ws.size.toLong
      val cov = ws.count(vocab).toLong
      (id, n, cov, 1000000L * cov / n)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._4 < 1000000L),
      "every doc fully covered - the top-25 cap binds nothing on this corpus")
  }

  test("shard_packing: exclusive offsets chain and shards respect the budget") {
    val got = graft.SparkEntry.queries("shard_packing")(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // offsets chain exactly: start(i+1) = start(i) + n_tokens(i)
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._2)
      case _ =>
    }
    assert(got.head._3 == 0L)
    got.foreach { case (_, _, off, shard) => assert(shard == off / 500L) }
    // packing is real: more than one shard, and some shard holds >1 doc
    assert(got.map(_._4).distinct.length > 1)
    assert(got.groupBy(_._4).values.exists(_.length > 1))
  }
}
