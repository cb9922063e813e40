package graft.tools

import graft.GraftSession
import graft.operators.NearDup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling validation for the banded near-dup paths: replicate the sf0.1
  * documents table K× with a per-replica word prefix (`x<k>foo x<k>bar …`),
  * which keeps every replica's shingle vocabulary DISJOINT from the others —
  * cross-replica Jaccard is exactly 0, so the true pair set (and the pair
  * density per document) is constant per replica and the ideal runtime is
  * LINEAR in K. A quadratic path (all-pairs, or candidate blowup through hot
  * shingles) would show t(K)/t(1) ≈ K²; the banded paths must stay ≈ K.
  *
  * Usage: `runMain graft.tools.ScaleBench [sfDir] [outDir]`. Prints one JSON
  * line per (query, K) with seconds and result rows, then a summary line with
  * the growth ratios. Results are recorded in SURVEY.md §4.
  */
object ScaleBench {

  private def scaled(docs: DataFrame, k: Int): DataFrame = {
    val n = 1000000L
    (0 until k).map { r =>
      // LETTER-ONLY replica prefix (za, zb, …): the shingle tokenizer keeps
      // only [a-z] runs, so a digit in the prefix would split off and leave
      // every replica sharing the same tokens — i.e. 10 near-identical copies
      // of each doc and a quadratic pair blowup, the opposite of the intended
      // disjoint-vocabulary scaling.
      // two tag letters support K up to 676 replicas (one ran out at 26)
      val tag = "z" + ('a' + r / 26).toChar + ('a' + r % 26).toChar
      docs.select(
        (col("doc_id") + lit(r * n)).as("doc_id"),
        // prefix every word with the tag: intra-replica shingle structure is
        // preserved (same near-dup pairs, shifted ids), replicas never collide
        regexp_replace(col("text"), "([A-Za-z]+)", s"$tag$$1").as("text"))
    }.reduce(_ unionByName _)
  }

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.getOrCreate(s"local[$cpus]", cpus.toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

    // 30× (≈ 150 k docs) probes past the fixed-overhead regime: at 10× the
    // banded paths still measured ≈ 1.2× wall, i.e. overhead dominated and
    // the true slope was unmeasured (r4 verdict item 5).
    val factors = Seq(1, 3, 10, 30)
    // materialize each scaled corpus so staging cost never pollutes the timing
    val staged = factors.map { k =>
      val p = s"$outDir/docs_x$k"
      scaled(docs, k).write.mode("overwrite").parquet(p)
      k -> p
    }.toMap

    // doc_lm_score's shape inline (corpus bigram counts joined back to doc
    // bigrams, both shuffles keyed by bigram): the disjoint replica
    // vocabularies grow the count table ~K×, so linear growth here validates
    // the whole token-keyed-join family (doc_lm_score, inverted_index,
    // doc_top_terms, freq_tokens_topk).
    def lmScore(d: DataFrame): Long = {
      val toks = graft.functions.ascii_tokens(col("text"))
      val bg = d.select(col("doc_id"),
        explode(filter(
          zip_with(toks, slice(toks, 2, 1000000), (a, b) => concat(a, lit(" "), b)),
          x => x.isNotNull)).as("bigram"))
      val corpus = bg.groupBy(col("bigram")).agg(count(lit(1)).as("cn"))
      bg.join(corpus, "bigram").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("cn")).as("lm_sum")).count()
    }
    // the two distributed-scan primitives (GlobalOrder / PrefixSum): ideal
    // growth is linear — the range exchange and both offset jobs are O(rows),
    // with only O(partitions [× groups]) ever on the driver.
    def globalShuffle(d: DataFrame): Long = {
      val keyed = d.select(col("doc_id"),
        md5(concat(lit("e:"), col("doc_id").cast("string"))).as("k"))
      graft.operators.GlobalOrder
        .withGlobalIndex(keyed, Seq(col("k"), col("doc_id")), "row_idx")
        .filter(col("row_idx") % 97 === 0).count()
    }
    def groupedScan(d: DataFrame): Long = {
      val t = d.select(col("doc_id"), (col("doc_id") % 5).as("g"),
        md5(col("doc_id").cast("string")).as("hk"),
        length(col("text")).cast("long").as("v"))
      graft.operators.PrefixSum
        .groupedRunningTotal(t, Seq("g"), Seq(col("hk"), col("doc_id")), "v", "cum")
        .filter(col("cum") % 97 === 0).count()
    }
    val queries: Seq[(String, DataFrame => Long)] = Seq(
      "dedup_minhash_lsh" -> (d => NearDup.minhashLshPairs(d, 0.8).count()),
      "ngram_jaccard_pairs" -> (d => NearDup.exactJaccardPairs(d, 0.8).count()),
      "doc_lm_score" -> lmScore,
      "deterministic_shuffle" -> globalShuffle,
      "grouped_prefix_sum" -> groupedScan)

    val results = for ((name, run) <- queries; k <- factors) yield {
      val d = spark.read.parquet(staged(k))
      run(d) // warm the input file listing + JIT once per (query, K)
      val (sec, rows) = time(run(d))
      println(s"""{"query":"$name","factor":$k,"sec":${f"$sec%.2f"},"pairs":$rows}""")
      (name, k, sec, rows)
    }

    val summary = queries.map { case (name, _) =>
      val byK = results.filter(_._1 == name).map(r => r._2 -> r._3).toMap
      val g10 = byK(10) / byK(1)
      val g30 = byK(30) / byK(1)
      s""""$name":{"t1":${f"${byK(1)}%.2f"},"t10":${f"${byK(10)}%.2f"},"t30":${f"${byK(30)}%.2f"},""" +
        s""""growth_10x":${f"$g10%.1f"},"growth_30x":${f"$g30%.1f"}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_growth","factors":${factors.mkString("[", ",", "]")},"detail":$summary}""")
    spark.stop()
  }
}
