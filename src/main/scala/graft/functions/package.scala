package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.shims.{toCol, toExpr}
import org.apache.spark.sql.functions._

/** Column-level API over the custom Catalyst kernels plus composed text
  * helpers. Everything here is engine-native (codegen'd built-ins or
  * single-pass custom expressions) — no Scala UDFs anywhere.
  */
package object functions {

  // ---- custom-kernel wrappers -------------------------------------------

  def minhash_signature(c: Column, numPerms: Int = 64): Column =
    toCol(MinHashSignature(toExpr(c), numPerms))

  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))

  def rolling_hash(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    toCol(RollingHash(toExpr(c), base, mod))

  def sign_random_projection(c: Column, numBits: Int = 16, seed: Int = 77): Column =
    toCol(SignRandomProjection(toExpr(c), numBits, seed))

  def sign_random_projection_poly(c: Column, numBits: Int = 16, seed: Int = 77): Column =
    toCol(SignRandomProjectionPoly(toExpr(c), numBits, seed))

  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))

  def word_shingles(c: Column, n: Int = 3): Column = toCol(WordShingles(toExpr(c), n))

  def minhash_bands(c: Column, numPerms: Int = 64, bands: Int = 16): Column =
    toCol(MinHashBands(toExpr(c), numPerms, bands))

  def simhash_chunks(c: Column, chunks: Int = 8): Column =
    toCol(SimHashChunks(toExpr(c), chunks))

  def z_order(a: Column, b: Column): Column = toCol(ZOrder2(toExpr(a), toExpr(b)))

  def l2_sq(a: Column, b: Column): Column = toCol(L2Sq(toExpr(a), toExpr(b)))

  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column =
    toCol(NearestCentroid(toExpr(v), centroids))

  def nfc_normalize(c: Column): Column = toCol(UnicodeNormalize(toExpr(c), "NFC"))

  def nfkc_normalize(c: Column): Column = toCol(UnicodeNormalize(toExpr(c), "NFKC"))

  def unicode_casefold(c: Column): Column = toCol(CaseFold(toExpr(c)))

  def char_split(w: Column): Column = toCol(CharSplit(toExpr(w)))

  def all_substrings(w: Column, maxLen: Int): Column =
    toCol(AllSubstrings(toExpr(w), maxLen))

  def unigram_viterbi(w: Column, vocab: UnigramVocab): Column =
    toCol(UnigramViterbi(toExpr(w), vocab))

  def merge_pair(sym: Column, left: String, right: String): Column =
    toCol(MergePair(toExpr(sym), left, right))

  /** Bounded-state per-group top-K aggregate (see [[TopKPairs]]): rank order
    * (priority, value) asc — or (priority DESC, value) with `descending` —
    * evaluating to the kept array<struct<p,v>> in rank order. */
  def topk_pairs(priority: Column, value: Column, k: Int,
      descending: Boolean = false): Column =
    toCol(TopKPairs(toExpr(priority), toExpr(value), k, descending)
      .toAggregateExpression())

  /** Iceberg bucket[N] of a long key (spec murmur3). */
  def iceberg_bucket(c: Column, n: Int): Column = toCol(IcebergBucket(toExpr(c), n))

  /** Real ImageIO decode: binary → struct(width, height, gray) or NULL. */
  def image_decode(c: Column): Column = toCol(ImageDecode(toExpr(c)))

  /** Real PNG encode of a row-major grayscale grid. */
  def png_encode(gray: Column, width: Column, height: Column): Column =
    toCol(PngEncode(toExpr(gray), toExpr(width), toExpr(height)))

  /** Real sampled-audio decode: binary → struct(sample_rate, channels,
    * samples) or NULL. */
  def wav_decode(c: Column): Column = toCol(WavDecode(toExpr(c)))

  /** Real WAV encode of 16-bit PCM mono samples. */
  def wav_encode(samples: Column, sampleRate: Column): Column =
    toCol(WavEncode(toExpr(samples), toExpr(sampleRate)))

  // ---- SQL-argument helpers: optional trailing parameters must be integer
  // literals (they parameterize codegen constants), and arity is validated so
  // e.g. `word_shingles(text, 5)` really runs with n = 5 instead of silently
  // dropping the argument.
  private def checkArity(fn: String, es: Seq[Expression], min: Int, max: Int): Unit =
    if (es.size < min || es.size > max)
      throw new IllegalArgumentException(
        s"$fn expects between $min and $max arguments, got ${es.size}")
  private def litLong(fn: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Int, _)   => v.toLong
    case Literal(v: Long, _)  => v
    case Literal(v: Short, _) => v.toLong
    case Literal(v: Byte, _)  => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got ${other.sql}")
  }
  private def litInt(fn: String, arg: String, e: Expression): Int =
    litLong(fn, arg, e).toInt
  private def litBool(fn: String, arg: String, e: Expression): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a boolean literal, got ${other.sql}")
  }

  /** (name, builder) for every SQL-surface kernel — the single source of
    * truth behind BOTH registration paths: [[registerAll]] (temp functions on
    * an existing session) and [[graft.GraftExtensions]]
    * (`spark.sql.extensions=graft.GraftExtensions`, the deployment path for
    * SQL-only clients — Thrift server, notebooks — that never touch Scala).
    */
  private[graft] val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_signature" -> { es =>
      checkArity("minhash_signature", es, 1, 2)
      MinHashSignature(es.head,
        if (es.size > 1) litInt("minhash_signature", "numPerms", es(1)) else 64)
    },
    "simhash64" -> { es =>
      checkArity("simhash64", es, 1, 1)
      SimHash64(es.head)
    },
    "nfc_normalize" -> { es =>
      checkArity("nfc_normalize", es, 1, 1)
      UnicodeNormalize(es.head, "NFC")
    },
    "nfkc_normalize" -> { es =>
      checkArity("nfkc_normalize", es, 1, 1)
      UnicodeNormalize(es.head, "NFKC")
    },
    "unicode_casefold" -> { es =>
      checkArity("unicode_casefold", es, 1, 1)
      CaseFold(es.head)
    },
    "rolling_hash" -> { es =>
      checkArity("rolling_hash", es, 1, 3)
      RollingHash(es.head,
        if (es.size > 1) litLong("rolling_hash", "base", es(1)) else 31L,
        if (es.size > 2) litLong("rolling_hash", "mod", es(2)) else 1000000007L)
    },
    "sign_random_projection" -> { es =>
      checkArity("sign_random_projection", es, 1, 3)
      SignRandomProjection(es.head,
        if (es.size > 1) litInt("sign_random_projection", "numBits", es(1)) else 16,
        if (es.size > 2) litInt("sign_random_projection", "seed", es(2)) else 77)
    },
    "sign_random_projection_poly" -> { es =>
      checkArity("sign_random_projection_poly", es, 1, 3)
      SignRandomProjectionPoly(es.head,
        if (es.size > 1) litInt("sign_random_projection_poly", "numBits", es(1)) else 16,
        if (es.size > 2) litInt("sign_random_projection_poly", "seed", es(2)) else 77)
    },
    "cosine_sim" -> { es =>
      checkArity("cosine_sim", es, 2, 2)
      CosineSim(es(0), es(1))
    },
    "word_shingles" -> { es =>
      checkArity("word_shingles", es, 1, 2)
      WordShingles(es.head, if (es.size > 1) litInt("word_shingles", "n", es(1)) else 3)
    },
    "minhash_bands" -> { es =>
      checkArity("minhash_bands", es, 1, 3)
      MinHashBands(es.head,
        if (es.size > 1) litInt("minhash_bands", "numPerms", es(1)) else 64,
        if (es.size > 2) litInt("minhash_bands", "bands", es(2)) else 16)
    },
    "l2_sq" -> { es =>
      checkArity("l2_sq", es, 2, 2)
      L2Sq(es(0), es(1))
    },
    "z_order" -> { es =>
      checkArity("z_order", es, 2, 2)
      ZOrder2(es(0), es(1))
    },
    "simhash_chunks" -> { es =>
      checkArity("simhash_chunks", es, 1, 2)
      SimHashChunks(es.head, if (es.size > 1) litInt("simhash_chunks", "chunks", es(1)) else 8)
    },
    "count_matches" -> { es =>
      checkArity("count_matches", es, 2, 2)
      es(1) match {
        case Literal(p, _) if p != null => CountMatches(es(0), p.toString)
        case other => throw new IllegalArgumentException(
          s"count_matches: argument 'pattern' must be a string literal, got ${other.sql}")
      }
    },
    // Aggregate kernel: the analyzer wraps a bare AggregateFunction from a
    // registry builder in a Complete AggregateExpression, so SQL users get
    // the bounded-state per-group top-K (`topk_pairs(p, v, 5, true)`) with
    // the same O(k) heap + map-side partial aggregation as the column API.
    "topk_pairs" -> { es =>
      checkArity("topk_pairs", es, 3, 4)
      TopKPairs(es(0), es(1), litInt("topk_pairs", "k", es(2)),
        if (es.size > 3) litBool("topk_pairs", "descending", es(3)) else false)
    },
    "iceberg_bucket" -> { es =>
      checkArity("iceberg_bucket", es, 2, 2)
      IcebergBucket(es.head, litInt("iceberg_bucket", "n", es(1)))
    },
    "image_decode" -> { es =>
      checkArity("image_decode", es, 1, 1)
      ImageDecode(es.head)
    },
    "png_encode" -> { es =>
      checkArity("png_encode", es, 3, 3)
      PngEncode(es(0), es(1), es(2))
    },
    "wav_decode" -> { es =>
      checkArity("wav_decode", es, 1, 1)
      WavDecode(es.head)
    },
    "wav_encode" -> { es =>
      checkArity("wav_encode", es, 2, 2)
      WavEncode(es(0), es(1))
    })

  /** SQL registration, so the kernels are callable from spark.sql(...).
    * Optional parameters map to the constructor params of the kernels, e.g.
    * `word_shingles(text, 5)`, `minhash_bands(shingles, 128, 32)`,
    * `rolling_hash(text, 31, 1000000007)`.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b(_), "scala_udf")
    }
  }

  // ---- text primitives (match the DuckDB oracle expressions exactly) ----

  /** lower → strip non-[a-z0-9 ] → collapse whitespace → trim. ASCII-safe
    * normalization identical across Spark (Java regex) and DuckDB (RE2). */
  def normalize_text(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]+", " "), " +", " "))

  /** ASCII word tokens of the lowercased text. */
  def ascii_tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+"), lit(0))

  /** Distinct character 3-gram shingles of the lowercased text. Mirrors
    * DuckDB `list_distinct(list_transform(generate_series(1, greatest(len-2,1)),
    * i -> substr(s,i,3)))`. */
  def shingles3(c: Column): Column = {
    val s = lower(c)
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - 2, lit(1))),
      i => s.substr(i, lit(3))))
  }

  /** BPE-ish tokenizer pieces: letter runs / digit runs / other runs, each
    * with an optional leading space (lookahead-free, RE2-compatible). */
  val bpeIshPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
}
