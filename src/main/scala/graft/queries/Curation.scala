package graft.queries

import graft.Q
import graft.core._
import graft.functions._
import graft.operators.NearDup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining pipeline runs between raw ingest
  * and dedup: rule-battery quality filtering (the Gopher/C4 family),
  * asymmetric containment detection (quotation / superset near-dups that
  * symmetric Jaccard misses), and collocation mining (bigram PMI — the
  * statistic behind multi-word-token candidates and boilerplate phrases).
  *
  * All verdicts are integer arithmetic (scaled e3/e6 floor divisions) so the
  * DuckDB oracles replay them bit-exactly — no double thresholds anywhere.
  * Reference scope: the reference pipeline ships rows from Snowflake into
  * Iceberg unfiltered (SnowflakeProcessFunction.java); the curation battery
  * is the training-data surface the brief adds on top.
  */
object Curation {

  private def docs(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "that")
  private val stopInList = stopEn.mkString("('", "','", "')")

  val defs: Seq[(String, Q)] = Seq(

    "gopher_quality_filters" -> Q(
      (s, d) => {
        // Gopher-style (Rae et al. 2021) doc-level rule battery from ONE
        // (doc_id, token) count table: word-count floor, mean-word-length
        // band, stopword floor, max-single-token-share cap. Two shuffles
        // total — (doc_id, tok) then doc_id — per-doc state is O(types),
        // and every rule is a scaled-integer floor division both engines
        // compute identically. Flags emitted as 0/1 BIGINTs so a 100 TB run
        // can aggregate drop-reasons without reparsing strings.
        val tc = docs(s, d)
          .select(col("doc_id"), explode(ascii_tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        tc.groupBy("doc_id").agg(
            sum(col("c")).as("n_words"),
            count(lit(1)).as("n_types"),
            max(col("c")).as("max_tok"),
            sum(col("c") * length(col("tok")).cast("long")).as("n_tok_chars"),
            sum(when(col("tok").isin(stopEn: _*), col("c")).otherwise(lit(0L))).as("n_stop"))
          .withColumn("mean_len_e3",
            idiv(lit(1000L) * col("n_tok_chars"), greatest(col("n_words"), lit(1L))))
          .withColumn("max_frac_e6",
            idiv(lit(1000000L) * col("max_tok"), greatest(col("n_words"), lit(1L))))
          .withColumn("f_words", (col("n_words") >= 20L).cast("long"))
          .withColumn("f_mean_len",
            (col("mean_len_e3") >= 3000L && col("mean_len_e3") <= 10000L).cast("long"))
          .withColumn("f_stop", (col("n_stop") >= 2L).cast("long"))
          .withColumn("f_repetition", (col("max_frac_e6") <= 120000L).cast("long"))
          .withColumn("keep",
            (col("f_words") === 1L && col("f_mean_len") === 1L
              && col("f_stop") === 1L && col("f_repetition") === 1L).cast("long"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
            FROM documents),
          tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
          st AS (SELECT doc_id,
              CAST(sum(c) AS BIGINT) AS n_words,
              count(*) AS n_types,
              CAST(max(c) AS BIGINT) AS max_tok,
              CAST(sum(c * length(tok)) AS BIGINT) AS n_tok_chars,
              CAST(sum(CASE WHEN tok IN $stopInList THEN c ELSE 0 END) AS BIGINT) AS n_stop
            FROM tc GROUP BY 1),
          fx AS (SELECT *,
              (1000 * n_tok_chars) // greatest(n_words, 1) AS mean_len_e3,
              (1000000 * max_tok) // greatest(n_words, 1) AS max_frac_e6
            FROM st),
          fl AS (SELECT *,
              CAST(CASE WHEN n_words >= 20 THEN 1 ELSE 0 END AS BIGINT) AS f_words,
              CAST(CASE WHEN mean_len_e3 BETWEEN 3000 AND 10000 THEN 1 ELSE 0 END AS BIGINT) AS f_mean_len,
              CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS f_stop,
              CAST(CASE WHEN max_frac_e6 <= 120000 THEN 1 ELSE 0 END AS BIGINT) AS f_repetition
            FROM fx)
        SELECT doc_id, n_words, n_types, max_tok, n_tok_chars, n_stop,
          mean_len_e3, max_frac_e6, f_words, f_mean_len, f_stop, f_repetition,
          CAST(f_words * f_mean_len * f_stop * f_repetition AS BIGINT) AS keep
        FROM fl ORDER BY doc_id"""),
      "Gopher-style quality rule battery: word-count / mean-word-length / " +
        "stopword / repetition gates as integer floor divisions, 0/1 flag " +
        "columns plus the combined keep verdict."),

    "doc_containment" -> Q(
      (s, d) => NearDup.containmentPairs(
        docs(s, d).select(col("doc_id"), col("text")), contE6 = 500000L),
      Some("""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
          sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 1)),
            i -> coalesce(w[i],'') || ' ' || coalesce(w[i+1],'') || ' ' || coalesce(w[i+2],''))) AS s FROM tok)
        SELECT id_a, id_b, n_common, n_a, cont_e6 FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
            CAST(len(a.s) AS BIGINT) AS n_a,
            (1000000 * len(list_intersect(a.s, b.s))) // len(a.s) AS cont_e6
          FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
        WHERE cont_e6 >= 500000 ORDER BY id_a, id_b"""),
      "Asymmetric shingle-containment pairs (|A∩B|/|A| ≥ 0.5, ordered): " +
        "prefix-filtered inverted index on the A side against the full index " +
        "on the B side — supersets that symmetric Jaccard misses, no cross " +
        "join, verified with the exact integer containment."),

    "bigram_pmi" -> Q(
      (s, d) => {
        // Collocation mining: pointwise-mutual-information-ranked adjacent
        // word pairs. Positional bigrams (not basket co-occurrence — that is
        // association_rules' shape): cxy = corpus occurrences of bigram
        // (x,y), cx = unigram occurrences, NB = total bigrams. The score is
        // the PMI lift cxy·NB / (cx·cy) in e6 floor arithmetic — monotone in
        // log-PMI, so the ranking IS the PMI ranking without either engine
        // taking a log. Magnitude bound: 10⁶·cxy·NB ≤ 9.2·10¹⁸ holds while
        // NB·cxy ≤ 9.2·10¹² (≈ a 3M-token corpus at the observed bigram
        // repetition) — past that, promote the numerator to DECIMAL(38,0);
        // the sf0.1 values sit 4 orders of magnitude under the edge.
        // Bigrams are built in ONE narrow pass — zip the token array with its
        // own tail (no positional self-join, nothing shuffles until the
        // counts); the oracle's join-on-pos+1 produces the same pairs.
        val arr = docs(s, d).select(ascii_tokens(col("text")).as("w"))
        val nMinus1 = greatest(size(col("w")) - 1, lit(0))
        val bg = arr.select(explode(zip_with(
            slice(col("w"), lit(1), nMinus1), slice(col("w"), lit(2), nMinus1),
            (a, b) => struct(a.as("tok_a"), b.as("tok_b")))).as("p"))
          .select(col("p.tok_a"), col("p.tok_b"))
        val uni = arr.select(explode(col("w")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cx"))
        val nb = bg.agg(count(lit(1)).as("nb"))
        bg.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("cxy"))
          .filter(col("cxy") >= 5L)
          .join(uni.select(col("tok").as("tok_a"), col("cx").as("cx_a")), "tok_a")
          .join(uni.select(col("tok").as("tok_b"), col("cx").as("cx_b")), "tok_b")
          .crossJoin(broadcast(nb))
          .withColumn("pmi_e6",
            idiv(lit(1000000L) * col("cxy") * col("nb"), col("cx_a") * col("cx_b")))
          .select(col("tok_a"), col("tok_b"), col("cxy"), col("cx_a"), col("cx_b"), col("pmi_e6"))
          .orderBy(desc("pmi_e6"), col("tok_a"), col("tok_b"))
          .limit(100)
      },
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
          toks AS (SELECT doc_id, unnest(w) AS tok, unnest(generate_series(1, len(w))) AS pos FROM t),
          bg AS (SELECT a.tok AS tok_a, b.tok AS tok_b
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
          uni AS (SELECT tok, count(*) AS cx FROM toks GROUP BY 1),
          nb AS (SELECT count(*) AS nb FROM bg),
          p AS (SELECT tok_a, tok_b, count(*) AS cxy FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        SELECT p.tok_a, p.tok_b, p.cxy, ca.cx AS cx_a, cb.cx AS cx_b,
          (1000000 * p.cxy * nb.nb) // (ca.cx * cb.cx) AS pmi_e6
        FROM p, nb
        JOIN uni ca ON ca.tok = p.tok_a
        JOIN uni cb ON cb.tok = p.tok_b
        ORDER BY pmi_e6 DESC, tok_a, tok_b LIMIT 100"""),
      "PMI-ranked adjacent-word collocations: positional bigram counts vs " +
        "unigram marginals, e6 integer lift (monotone in log-PMI), " +
        "deterministic top-100.")
  ) ++ Seq(

    "source_mix_hhi" -> Q(
      (s, d) => {
        // Data-mixture concentration audit: per language, the Herfindahl
        // index of source shares (HHI_e12 = 10¹²·Σc² ÷ S², floor) plus the
        // top source's share — the "is this slice secretly one crawler?"
        // check a mixture rebalance runs first. Two hash aggregates, both
        // partially aggregated map-side; the Σc² product is DECIMAL(38,0)
        // (HUGEINT in the mirror) because 10¹²·Σc² crosses 2⁶³ as soon as a
        // lang holds ~10⁵ docs of one source — i.e. immediately at scale.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        docs(s, d).groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("lang"))
          .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_sources"),
            max(col("c")).as("max_c"), sum(col("c") * col("c")).as("sum_c2"))
          .withColumn("top_share_e6",
            idiv(lit(1000000L) * col("max_c"), col("n_docs")))
          .withColumn("hhi_e12",
            idiv(lit(1000000000000L).cast(d38) * col("sum_c2").cast(d38),
              col("n_docs").cast(d38) * col("n_docs").cast(d38)))
          .select(col("lang"), col("n_docs"), col("n_sources"),
            col("top_share_e6"), col("hhi_e12"))
          .orderBy(col("lang"))
      },
      Some("""WITH sc AS (SELECT lang, source, count(*) AS c
            FROM documents GROUP BY 1, 2),
          g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs,
              count(*) AS n_sources, CAST(max(c) AS BIGINT) AS max_c,
              CAST(sum(c * c) AS BIGINT) AS sum_c2
            FROM sc GROUP BY 1)
        SELECT lang, n_docs, n_sources,
          (1000000 * max_c) // n_docs AS top_share_e6,
          CAST((1000000000000 * CAST(sum_c2 AS HUGEINT))
               // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS hhi_e12
        FROM g ORDER BY lang"""),
      "Herfindahl source-concentration per language slice: e12 integer HHI " +
        "+ e6 top-source share, two partial-aggregated passes, " +
        "DECIMAL(38,0)/HUGEINT products.")
  ) ++ Seq(

    "token_diversity" -> Q(
      (s, d) => {
        // Per-doc lexical-diversity scores, all integer: type-token ratio
        // (n_types/S, e6 floor) and Gini impurity 1 − Σc²/S² (the
        // log-free stand-in for token entropy — same ordering on the
        // degenerate/repetitive docs a quality gate drops). One (doc,tok)
        // count table → one doc aggregate; per-doc Σc² ≤ S² ≤ 10⁸ keeps
        // everything in BIGINT at any corpus size (the bound is per-DOC
        // length, not corpus size — that's why this one needs no HUGEINT).
        val tc = docs(s, d)
          .select(col("doc_id"), explode(ascii_tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        tc.groupBy("doc_id").agg(
            sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
            sum(col("c") * col("c")).as("sum_c2"))
          .withColumn("ttr_e6",
            idiv(lit(1000000L) * col("n_types"), col("n_tokens")))
          .withColumn("gini_e6", lit(1000000L) -
            idiv(lit(1000000L) * col("sum_c2"), col("n_tokens") * col("n_tokens")))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            col("ttr_e6"), col("gini_e6"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
            FROM documents),
          tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
          g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS sum_c2
            FROM tc GROUP BY 1)
        SELECT doc_id, n_tokens, n_types,
          (1000000 * n_types) // n_tokens AS ttr_e6,
          1000000 - (1000000 * sum_c2) // (n_tokens * n_tokens) AS gini_e6
        FROM g ORDER BY doc_id"""),
      "Per-doc lexical diversity: e6 type-token ratio + Gini impurity " +
        "1 − Σc²/S² (log-free entropy stand-in), all-BIGINT because the " +
        "bound is per-doc length."),

    "shingle_novelty" -> Q(
      (s, d) => {
        // Novelty profiling in corpus order: per doc, the fraction of its
        // 3-gram shingles whose GLOBAL first occurrence (min doc_id) is
        // this doc — the marginal-contribution signal a dedup-aware
        // sampler maximizes (a doc of entirely seen shingles adds ~nothing
        // even if no single pair crosses the near-dup bar). Shapes: one
        // (shingle → min doc) aggregate, joined back to the postings on
        // the shingle key (co-partitioned: same key, back-to-back), then a
        // doc-level count — never any pairwise comparison.
        val sh = docs(s, d)
          .select(col("doc_id"),
            explode(graft.functions.word_shingles(col("text"), 3)).as("g"))
          .distinct()
        val firstDoc = sh.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
        sh.join(firstDoc, "g")
          .groupBy(col("doc_id")).agg(
            count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .withColumn("novelty_e6",
            idiv(lit(1000000L) * col("n_novel"), col("n_shingles")))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents),
          sh AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id,
              unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
                i -> coalesce(w[i],'') || ' ' || coalesce(w[i+1],'') || ' ' || coalesce(w[i+2],''))) AS g
            FROM tok)),
          fd AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        SELECT sh.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN fd.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
          (1000000 * CAST(sum(CASE WHEN fd.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS novelty_e6
        FROM sh JOIN fd ON sh.g = fd.g
        GROUP BY 1 ORDER BY doc_id"""),
      "Corpus-order novelty per doc: fraction of shingles first seen here " +
        "(min-doc attribution join, co-partitioned on the shingle key) — " +
        "the marginal-contribution signal for dedup-aware sampling."),

    "vocab_coverage" -> Q(
      (s, d) => {
        // Tokenizer-vocabulary coverage audit: what fraction of each doc's
        // token OCCURRENCES the top-25 corpus vocabulary covers — the
        // pre-flight check before committing to a fixed vocab (high OOV
        // slices are where a tokenizer bleeds compression). The top-K
        // vocabulary is TakeOrdered-bounded (deterministic (count, token)
        // tiebreak) and joins back broadcast — O(K), corpus-independent;
        // the per-doc pass is the same (doc, tok) count table the quality
        // battery uses.
        val tok = docs(s, d)
          .select(col("doc_id"), explode(ascii_tokens(col("text"))).as("tok"))
        val tc = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val vocab = tc.groupBy("tok").agg(sum(col("c")).as("cn"))
          .orderBy(desc("cn"), col("tok")).limit(25)
          .select(col("tok"), lit(1L).as("in_vocab"))
        tc.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("doc_id").agg(
            sum(col("c")).as("n_tokens"),
            sum(when(col("in_vocab") === 1L, col("c")).otherwise(0L)).as("n_covered"))
          .withColumn("coverage_e6",
            idiv(lit(1000000L) * col("n_covered"), col("n_tokens")))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
            FROM documents),
          tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
          vocab AS (SELECT tok FROM (SELECT tok, CAST(sum(c) AS BIGINT) AS cn,
              row_number() OVER (ORDER BY CAST(sum(c) AS BIGINT) DESC, tok) AS rn
            FROM tc GROUP BY tok) WHERE rn <= 25)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN v.tok IS NOT NULL THEN c ELSE 0 END) AS BIGINT) AS n_covered,
          (1000000 * CAST(sum(CASE WHEN v.tok IS NOT NULL THEN c ELSE 0 END) AS BIGINT))
            // CAST(sum(c) AS BIGINT) AS coverage_e6
        FROM tc LEFT JOIN vocab v ON tc.tok = v.tok
        GROUP BY doc_id ORDER BY doc_id"""),
      "Top-K vocabulary coverage per doc (the OOV-rate audit): bounded " +
        "TakeOrdered vocab broadcast back over the (doc,tok) counts, e6 " +
        "occurrence coverage."),

    "shard_packing" -> Q(
      (s, d) => {
        // Token-budget shard assignment (the pretraining writer's layout
        // step): docs in deterministic corpus order pack next-fit into
        // 500-token shards — shard = start_offset div budget, where the
        // start offset is the EXCLUSIVE prefix sum of token counts. The
        // running total comes from PrefixSum's two-job range-exchange scan
        // (an ORDER BY-all window would funnel the corpus through one
        // task); the oracle replays it with exactly that window, the shape
        // that checks the result but wouldn't scale.
        val counts = docs(s, d)
          .select(col("doc_id"),
            size(ascii_tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("g", lit(0L))
        graft.operators.PrefixSum
          .groupedRunningTotal(counts, Seq("g"), Seq(col("doc_id")), "n_tokens", "cum")
          .withColumn("start_off", col("cum") - col("n_tokens"))
          .withColumn("shard", idiv(col("start_off"), lit(500L)))
          .select(col("doc_id"), col("n_tokens"), col("start_off"), col("shard"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT doc_id,
              CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_tokens
            FROM documents),
          p AS (SELECT doc_id, n_tokens,
              CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
            FROM c)
        SELECT doc_id, n_tokens, start_off, start_off // 500 AS shard
        FROM p ORDER BY doc_id"""),
      "Next-fit token-budget shard packing: exclusive prefix sum via the " +
        "distributed PrefixSum scan (no ORDER-BY-all window), shard = " +
        "start_offset div budget."),

    "pii_scan" -> Q(
      (s, d) => {
        // PII exposure audit before a corpus ships: per-source counts of
        // email-shaped, phone-shaped, and long-digit-run matches. Pure
        // per-row regexp_count (codegen'd builtin, non-overlapping matches
        // in both engines — the patterns avoid constructs where Java regex
        // and RE2 diverge) folded by ONE source-keyed aggregate; the scan
        // reads two columns. Zero hits still prove the negative — the
        // audit's contract is the count, not the find.
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
        val phone = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
        val digits = "[0-9]{9,}"
        docs(s, d)
          .select(col("source"),
            regexp_count(col("text"), lit(email)).cast("long").as("e"),
            regexp_count(col("text"), lit(phone)).cast("long").as("p"),
            regexp_count(col("text"), lit(digits)).cast("long").as("g"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum((col("e") > 0L).cast("long")).as("docs_email"),
            sum((col("p") > 0L).cast("long")).as("docs_phone"),
            sum((col("g") > 0L).cast("long")).as("docs_digitrun"),
            sum(col("e")).as("hits_email"),
            sum(col("p")).as("hits_phone"),
            sum(col("g")).as("hits_digitrun"))
          .orderBy("source")
      },
      Some("""WITH m AS (SELECT source,
            CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS BIGINT) AS e,
            CAST(len(regexp_extract_all(text, '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]')) AS BIGINT) AS p,
            CAST(len(regexp_extract_all(text, '[0-9]{9,}')) AS BIGINT) AS g
          FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
          CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_phone,
          CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_digitrun,
          CAST(sum(e) AS BIGINT) AS hits_email,
          CAST(sum(p) AS BIGINT) AS hits_phone,
          CAST(sum(g) AS BIGINT) AS hits_digitrun
        FROM m GROUP BY source ORDER BY source"""),
      "Per-source PII exposure audit: regexp_count of email / phone / " +
        "long-digit-run shapes per document, one source-keyed fold — doc " +
        "and hit counts per pattern class."),

    "dataset_card" -> Q(
      (s, d) => {
        // The release artifact: one (metric, value) summary table a dataset
        // card publishes — corpus size, source/language breadth, token
        // volume, exact-duplicate rate, length profile. Each metric is one
        // aggregate over the corpus scan; the md5 duplicate count is the
        // dedup_exact statistic folded to a single number. Everything lands
        // as BIGINT so the card diffs cleanly across releases.
        val dd = docs(s, d)
        val base = dd.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(size(ascii_tokens(col("text"))).cast("long")).as("total_tokens"),
          sum((length(col("text")) >= 1000).cast("long")).as("docs_ge_1k_chars"),
          sum(col("n_chars")).as("total_chars"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("exact_dup_docs"))
        base.selectExpr(
          "stack(7, " +
            "'n_docs', n_docs, " +
            "'n_sources', n_sources, " +
            "'n_langs', n_langs, " +
            "'total_tokens', total_tokens, " +
            "'docs_ge_1k_chars', docs_ge_1k_chars, " +
            "'total_chars', total_chars, " +
            "'exact_dup_docs', exact_dup_docs) AS (metric, value)")
          .orderBy(col("metric"))
      },
      Some("""WITH a AS (SELECT count(*) AS n_docs,
            count(DISTINCT source) AS n_sources,
            count(DISTINCT lang) AS n_langs,
            CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS total_tokens,
            CAST(sum(CASE WHEN length(text) >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS docs_ge_1k_chars,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            count(*) - count(DISTINCT md5(text)) AS exact_dup_docs
          FROM documents)
        SELECT metric, value FROM (
          SELECT 'n_docs' AS metric, n_docs AS value FROM a
          UNION ALL SELECT 'n_sources', n_sources FROM a
          UNION ALL SELECT 'n_langs', n_langs FROM a
          UNION ALL SELECT 'total_tokens', total_tokens FROM a
          UNION ALL SELECT 'docs_ge_1k_chars', docs_ge_1k_chars FROM a
          UNION ALL SELECT 'total_chars', total_chars FROM a
          UNION ALL SELECT 'exact_dup_docs', exact_dup_docs FROM a)
        ORDER BY metric"""),
      "Dataset-card summary table: corpus size, source/language breadth, " +
        "token volume, exact-dup rate, length profile — one scan, stacked " +
        "to (metric, value) BIGINT rows."),

    "vocab_growth_curve" -> Q(
      (s, d) => {
        // Heaps-law vocabulary growth: cumulative distinct tokens after
        // each 25-doc ingest bucket — the curve that says when a corpus
        // stops teaching a tokenizer new TYPES — measured on 3-word
        // shingles (this corpus's 60-word unigram vocabulary saturates in
        // one bucket; the shingle space keeps growing). First occurrence
        // per shingle (one aggregate), bucket by the introducing doc, the
        // cumulative rides PrefixSum's two-job scan: the bucket frame is
        // O(docs/25), far past any window-over-everything at corpus scale.
        val first = docs(s, d)
          .select(col("doc_id"),
            explode(graft.functions.word_shingles(col("text"), 3)).as("tok"))
          .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
        val buckets = first
          .groupBy(idiv(col("first_doc"), lit(25L)).as("bucket"))
          .agg(count(lit(1)).as("new_tokens"))
          .withColumn("g", lit(0L))
        graft.operators.PrefixSum
          .groupedRunningTotal(buckets, Seq("g"), Seq(col("bucket")), "new_tokens", "cum_vocab")
          .select(col("bucket"), col("new_tokens"), col("cum_vocab"))
          .orderBy(col("bucket"))
      },
      Some("""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
          t AS (SELECT doc_id, unnest(list_distinct(list_transform(
              generate_series(1, greatest(len(ws) - 2, 1)),
              i -> coalesce(ws[i],'') || ' ' || coalesce(ws[i+1],'') || ' ' || coalesce(ws[i+2],'')))) AS tok
            FROM w),
          f AS (SELECT tok, min(doc_id) AS first_doc FROM t GROUP BY 1),
          b AS (SELECT first_doc // 25 AS bucket, count(*) AS new_tokens
            FROM f GROUP BY 1)
        SELECT bucket, new_tokens,
          CAST(sum(new_tokens) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
        FROM b ORDER BY bucket"""),
      "Vocabulary growth curve (Heaps' law) over 3-word shingles: " +
        "first-occurrence doc per type, 25-doc ingest buckets, cumulative " +
        "distinct types via PrefixSum — when the corpus stops teaching."),

    "per_source_dedup_rates" -> Q(
      (s, d) => {
        // Where the duplicates live: per-source exact-duplicate rates (the
        // dataset_card number broken out to its actionable granularity).
        // One aggregate; md5 identity matches dedup_exact's.
        docs(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_unique"))
          .select(col("source"), col("n_docs"), col("n_unique"),
            idiv(lit(1000000L) * (col("n_docs") - col("n_unique")), col("n_docs"))
              .as("dup_rate_e6"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs,
          count(DISTINCT md5(text)) AS n_unique,
          (1000000 * (count(*) - count(DISTINCT md5(text)))) // count(*) AS dup_rate_e6
        FROM documents GROUP BY 1 ORDER BY source"""),
      "Per-source exact-duplicate rates (e6): the dataset-card dup number " +
        "at its actionable granularity, one aggregate."),

    "url_canonicalize" -> Q(
      (s, d) => {
        import s.implicits._
        // URL CANONICALIZATION — the crawl-dedup step upstream of every
        // text dedup (the same page arrives under scheme/host case
        // variants, default ports, tracking params, shuffled query order,
        // fragments, trailing slashes): lowercase scheme+host, strip the
        // scheme's default port, drop utm_* params, sort the survivors,
        // strip fragment and trailing slash. Raw URLs are synthesized
        // deterministically from (doc_id, source) with exactly those
        // variations, so distinct raw forms provably collapse. One
        // projection + one aggregate; every string op is engine-identical
        // (regexp groups, literal splits, lexicographic array sort).
        val raw = concat(
          when($"doc_id" % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
          when($"doc_id" % 3 === 0, "WWW.").otherwise("www."), $"source",
          when($"doc_id" % 5 === 0, ".COM").otherwise(".com"),
          when($"doc_id" % 7 === 0, ":443").otherwise(""),
          lit("/docs/"), ($"doc_id" % 50).cast("string"),
          when($"doc_id" % 4 === 0, "/").otherwise(""),
          when($"doc_id" % 2 === 0,
              concat(lit("?b=2&a="), ($"doc_id" % 10).cast("string"),
                lit("&utm_source=feed")))
            .otherwise(concat(lit("?a="), ($"doc_id" % 10).cast("string"), lit("&b=2"))),
          when($"doc_id" % 6 === 0, concat(lit("#sec"), ($"doc_id" % 3).cast("string")))
            .otherwise(""))
        val withRaw = table(s, d, "documents").select($"doc_id", $"source")
          .withColumn("raw", raw)
        val noFrag = split($"raw", "#").getItem(0)
        val prePath = split(noFrag, "\\?").getItem(0)
        val query = split(noFrag, "\\?").getItem(1)
        val scheme = lower(regexp_extract(prePath, "^([A-Za-z]+)://", 1))
        val hostport = regexp_extract(prePath, "^[A-Za-z]+://([^/]+)", 1)
        val host = lower(split(hostport, ":").getItem(0))
        val path = regexp_replace(
          regexp_extract(prePath, "^[A-Za-z]+://[^/]+(/.*)$", 1), "/$", "")
        val params = array_sort(filter(split(query, "&"),
          p => substring(p, 1, 4) =!= "utm_"))
        val canon = concat(scheme, lit("://"), host, path,
          when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
            .otherwise(""))
        withRaw.withColumn("canonical_url", canon)
          .groupBy($"canonical_url")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"raw").as("n_raw_forms"),
            min($"doc_id").as("min_doc_id"))
          .orderBy($"canonical_url")
      },
      Some("""WITH r AS (SELECT doc_id, source,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
          (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END) || source ||
          (CASE WHEN doc_id % 5 = 0 THEN '.COM' ELSE '.com' END) ||
          (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
          '/docs/' || CAST(doc_id % 50 AS VARCHAR) ||
          (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
          (CASE WHEN doc_id % 2 = 0
            THEN '?b=2&a=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_source=feed'
            ELSE '?a=' || CAST(doc_id % 10 AS VARCHAR) || '&b=2' END) ||
          (CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
            ELSE '' END) AS raw
        FROM documents),
        c AS (SELECT doc_id, raw,
            lower(regexp_extract(pp, '^([A-Za-z]+)://', 1)) || '://' ||
            lower(string_split(regexp_extract(pp, '^[A-Za-z]+://([^/]+)', 1), ':')[1]) ||
            regexp_replace(regexp_extract(pp, '^[A-Za-z]+://[^/]+(/.*)$', 1), '/$', '') ||
            (CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END)
              AS canonical_url
          FROM (SELECT doc_id, raw,
              string_split(string_split(raw, '#')[1], '?')[1] AS pp,
              list_sort(list_filter(
                string_split(string_split(string_split(raw, '#')[1], '?')[2], '&'),
                p -> substr(p, 1, 4) <> 'utm_')) AS ps
            FROM r))
        SELECT canonical_url, count(*) AS n_docs,
          count(DISTINCT raw) AS n_raw_forms,
          min(doc_id) AS min_doc_id
        FROM c GROUP BY 1 ORDER BY canonical_url"""),
      "URL canonicalization (crawl dedup upstream): case, default-port, " +
        "utm-param, query-order, fragment, and trailing-slash variants " +
        "collapse to one canonical form — one projection + one aggregate.")
  )
}
