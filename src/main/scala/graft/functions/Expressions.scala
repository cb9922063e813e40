package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the dedup / similarity operators — single-pass
  * per-row evaluation over `ArrayData` with zero boxing and zero Scala-UDF
  * dispatch. Each replaces what would otherwise be a chain of 64+ higher-order
  * function expressions (e.g. one `transform`+`array_min` pair per MinHash
  * permutation), which is the difference between O(shingles) and
  * O(shingles × permutations) array traversals per document.
  *
  * All expressions generate code (a static call into [[Kernels]]), so they
  * stay inside WholeStageCodegen spans instead of forcing the
  * `CodegenFallback` row-materialization path.
  */


/** Analysis-time input validation for the kernels (r16 — surfaced by the
  * multi-JVM smoke drive: a mistyped argument previously slipped analysis
  * and died at CODEGEN with a Janino error naming generated.java, or a
  * ClassCastException on the interpreted path — neither names the caller).
  * Spark 4 keeps AbstractDataType private[sql], so the kernels validate
  * via `checkInputDataTypes` rather than `ExpectsInputTypes`. */
private[functions] object KernelTypes {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  type Want = (DataType => Boolean, String)
  val stringArray: Want = ({ case ArrayType(StringType, _) => true
    case _ => false }: DataType => Boolean, "array<string>")
  val numArray: Want = ({ case ArrayType(FloatType | DoubleType, _) => true
    case _ => false }: DataType => Boolean, "array<float> or array<double>")
  val intArray: Want = ({ case ArrayType(IntegerType, _) => true
    case _ => false }: DataType => Boolean, "array<int>")
  val string: Want = (_ == StringType, "string")
  val long: Want = (_ == LongType, "bigint")
  val int: Want = (_ == IntegerType, "int")
  val binary: Want = (_ == BinaryType, "binary")
  def check(fn: String, args: (Expression, Want)*): TypeCheckResult =
    args.zipWithIndex.collectFirst {
      case ((e, (ok, want)), i) if !ok(e.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn argument ${i + 1} expects $want, got ${e.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** 64-permutation MinHash signature of a shingle set (array<string>).
  * sig[j] = min over shingles of murmur3_32(shingle, seed_j), as unsigned.
  * The classic shingle→minhash construction; one pass over the shingles
  * computes all permutations. Empty input yields the all-MaxValue signature
  * (bucket hashes then never collide with real documents).
  */
case class MinHashSignature(child: Expression, numPerms: Int = 64)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("minhash_signature", child -> KernelTypes.stringArray)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashSignature(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhashSignature($c, $numPerms)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** MinHash LSH band hashes, fused: computes the `numPerms`-permutation
  * signature and folds each consecutive `numPerms / bands` values into one
  * 64-bit band hash, in a single pass over the shingles. Emitting band hashes
  * directly matters for plan shape: banding a separately-projected signature
  * with a higher-order `transform` re-evaluates the signature expression once
  * per band after `CollapseProject` inlines it (16× the work at 16 bands);
  * this kernel is evaluated exactly once per row however the projection
  * collapses.
  */
case class MinHashBands(child: Expression, numPerms: Int = 64, bands: Int = 16)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("minhash_bands", child -> KernelTypes.stringArray)

  require(bands > 0 && numPerms % bands == 0,
    s"minhash_bands: numPerms ($numPerms) must be a positive multiple of bands ($bands); " +
      "otherwise the trailing numPerms % bands permutations would be computed but " +
      "silently excluded from every band hash, changing the LSH collision probability")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.minhashBands(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numPerms, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhashBands($c, $numPerms, $bands)")
  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** 64-bit SimHash over a token array: per-token 64-bit hash (two murmur32
  * lanes), per-bit majority vote. Near-dup docs differ in few bits; pairs
  * within Hamming distance k are found exactly by banding the 64 bits into
  * k+1 chunks (pigeonhole: k flips cannot touch all k+1 chunks).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("simhash64", child -> KernelTypes.stringArray)

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** SimHash chunk values for pigeonhole banding, fused for the same plan-shape
  * reason as [[MinHashBands]]: emits `chunks` bit slices of the 64-bit
  * SimHash as an array, computing the hash once per row. The slices PARTITION
  * the 64 bits — each of the first `chunks-1` gets ⌊64/chunks⌋ bits and the
  * last gets the remainder — so the full hash is recoverable from the chunks
  * and pigeonhole banding stays exact for any chunk count in [1, 64].
  */
case class SimHashChunks(child: Expression, chunks: Int = 8)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("simhash_chunks", child -> KernelTypes.stringArray)

  require(chunks >= 1 && chunks <= 64,
    s"simhash_chunks: chunks ($chunks) must be in [1, 64]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.simhashChunks(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], chunks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhashChunks($c, $chunks)")
  override protected def withNewChildInternal(c: Expression): SimHashChunks = copy(child = c)
}

/** Distinct word n-gram shingles of a text column, in one pass: lowercase,
  * split into ASCII-letter runs, join each n consecutive tokens with single
  * spaces. Semantics mirror the SQL form
  * `list_distinct(list_transform(generate_series(1, greatest(n_tok-(n-1),1)),
  *   i -> coalesce(w[i],'') || ' ' || ... ))` — i.e. documents with fewer
  * than n tokens yield one shingle padded with empty strings. Replaces a
  * regexp + 3×try_element_at + concat + array_distinct higher-order chain
  * that cost ~3 ms/doc; this is a single byte scan.
  */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("word_shingles", child -> KernelTypes.string)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.wordShingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** Unicode normalization to `form` (NFC/NFD/NFKC/NFKD — r16): codegen'd
  * static call into [[Kernels.unicodeNormalize]]; the form resolves to the
  * enum constant at codegen time. NFC is the dedup canonicalization (DuckDB
  * ships `nfc_normalize`, so the oracle replays it exactly); NFKC folds
  * COMPATIBILITY forms — fullwidth latin, ligatures, superscripts — the
  * stronger fold a training-data pipeline wants before tokenization. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize: unknown form $form (NFC/NFD/NFKC/NFKD)")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check(s"${form.toLowerCase}_normalize", child -> KernelTypes.string)
  override def dataType: DataType = StringType
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
  override def nullSafeEval(input: Any): Any =
    Kernels.unicodeNormalize(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.unicodeNormalize($c, java.text.Normalizer.Form.$form)")
  override protected def withNewChildInternal(c: Expression): UnicodeNormalize = copy(child = c)
}

/** Locale-independent caseless fold ([[Kernels.caseFold]]): the
  * upper-then-lower ROOT round trip (ß→ss, ς→σ) — what caseless dedup
  * needs beyond `lower()`. */
case class CaseFold(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("unicode_casefold", child -> KernelTypes.string)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Kernels.caseFold(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.caseFold($c)")
  override protected def withNewChildInternal(c: Expression): CaseFold = copy(child = c)
}

/** `count(regex matches)` without materializing the match array. The
  * [[graft.RegexCountRewrite]] optimizer rule (injected via
  * [[graft.GraftExtensions]]) rewrites `size(regexp_extract_all(s, pat, 0))`
  * — the token-counting idiom all over the text-quality surface — into this
  * single-pass count: same `Matcher.find()` loop as `regexp_extract_all`,
  * zero per-row array allocation. On a 100 TB text corpus the rewrite
  * removes one transient O(tokens) array per document from every
  * token-count expression.
  */
case class CountMatches(child: Expression, pattern: String)
    extends UnaryExpression {
  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"count_matches expects a string input, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Kernels.countMatches(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmPattern", compiled, "java.util.regex.Pattern")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.countMatches($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): CountMatches = copy(child = c)
}

/** Polynomial (Horner) rolling hash of an ASCII string:
  * h = Σ byte_i · base^(n-1-i) mod `mod`. Content-defined fingerprinting
  * primitive; parameters chosen so a SQL reimplementation (Horner fold with
  * per-step mod) matches exactly.
  */
case class RollingHash(child: Expression, base: Long = 31L, mod: Long = 1000000007L)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("rolling_hash", child -> KernelTypes.string)

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Kernels.rollingHash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], base, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.rollingHash($c, ${base}L, ${mod}L)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** Sign-random-projection LSH bucket of an embedding (array<float|double>):
  * bit j = sign(v · r_j) with Rademacher ±1 hyperplanes derived from
  * murmur3(seed, j·8192 + i). `numBits` bits pack into an int bucket id —
  * cosine-similar vectors collide with high probability.
  */
case class SignRandomProjection(child: Expression, numBits: Int = 16, seed: Int = 77)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("sign_random_projection", child -> KernelTypes.numArray)

  override def dataType: DataType = IntegerType
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(Kernels.signRandomProjection(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numBits, seed, isFloat))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.signRandomProjection($c, $numBits, $seed, $isFloat)")
  override protected def withNewChildInternal(c: Expression): SignRandomProjection = copy(child = c)
}

/** [[SignRandomProjection]] with the LCG sign source
  * ([[Kernels.signRandomProjectionPoly]]) — the bucket assignment a DuckDB
  * oracle can replay in plain BIGINT arithmetic. */
case class SignRandomProjectionPoly(child: Expression, numBits: Int = 16,
    seed: Int = 77) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("sign_random_projection_poly", child -> KernelTypes.numArray)

  override def dataType: DataType = IntegerType
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(Kernels.signRandomProjectionPoly(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numBits, seed, isFloat))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.signRandomProjectionPoly($c, $numBits, $seed, $isFloat)")
  override protected def withNewChildInternal(c: Expression): SignRandomProjectionPoly =
    copy(child = c)
}

/** Bloom-filter membership probe over a long key: `bloom.mightContainLong(c)`.
  * The filter is built once (driver-side, from a distributed aggregation of
  * the build side's keys) and shipped to executors inside the generated
  * code's reference array — the manual analogue of Spark's runtime bloom
  * join pruning, usable when the optimizer's injection thresholds don't
  * trigger. False positives only (never false negatives), so placing it
  * BEFORE an equi-join keeps the join result exact while cutting the probe
  * side's shuffle volume to ~|matching| + fpp·|non-matching| rows.
  */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("bloom_might_contain", child -> KernelTypes.long)

  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain = copy(child = c)
}

/** Squared L2 distance of two equal-length numeric arrays, fused single
  * pass — the k-means / IVF assignment inner loop ([[Kernels.l2sq]]). */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("l2sq", left -> KernelTypes.numArray, right -> KernelTypes.numArray)

  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(Kernels.l2sq(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lf, rf))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Kernels.l2sq($x, $y, $lf, $rf)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Sq =
    copy(left = l, right = r)
}

/** Single-character symbol array of a word ([[Kernels.charSplit]]) — the BPE
  * base alphabet projection. */
case class CharSplit(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("char_split", child -> KernelTypes.string)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.charSplit(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.charSplit($c)")
  override protected def withNewChildInternal(c: Expression): CharSplit = copy(child = c)
}

/** One BPE merge over a symbol array ([[Kernels.mergePair]]): adjacent
  * (left, right) symbols fuse left-to-right. The merge pair rides along as
  * codegen reference objects, so a learned merge applies as ONE expression
  * regardless of vocabulary round. */
case class MergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("merge_pair", child -> KernelTypes.stringArray)

  private lazy val ua = org.apache.spark.unsafe.types.UTF8String.fromString(left)
  private lazy val ub = org.apache.spark.unsafe.types.UTF8String.fromString(right)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.mergePair(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], ua, ub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("bpeLeft", ua, "UTF8String")
    val rb = ctx.addReferenceObj("bpeRight", ub, "UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.mergePair($c, $ra, $rb)")
  }
  override protected def withNewChildInternal(c: Expression): MergePair = copy(child = c)
}

/** Every substring occurrence of length 1..maxLen
  * ([[Kernels.allSubstrings]]) — the unigram-LM seed-vocabulary candidate
  * stream, fused into one pass instead of a sequence→transform→flatten
  * higher-order chain. */
case class AllSubstrings(child: Expression, maxLen: Int)
    extends UnaryExpression {
  require(maxLen >= 1, s"all_substrings: maxLen must be >= 1, got $maxLen")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("all_substrings", child -> KernelTypes.string)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.allSubstrings(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.allSubstrings($c, $maxLen)")
  override protected def withNewChildInternal(c: Expression): AllSubstrings = copy(child = c)
}

/** Viterbi segmentation under a unigram-LM vocabulary
  * ([[Kernels.unigramViterbi]]): emits `struct(ps array<string>, score_e6
  * bigint)`. The vocabulary rides as a codegen REFERENCE OBJECT
  * ([[UnigramVocab]]) — the expression tree and the generated Java stay
  * O(1) no matter the vocabulary size, the [[NearestCentroid]] codebook
  * pattern applied to tokenization. */
case class UnigramViterbi(child: Expression, vocab: UnigramVocab)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("unigram_viterbi", child -> KernelTypes.string)
  override def dataType: DataType = StructType(Seq(
    StructField("ps", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("score_e6", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    Kernels.unigramViterbi(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab, "graft.functions.UnigramVocab")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.unigramViterbi($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): UnigramViterbi = copy(child = c)
}

/** Nearest centroid of an embedding against a driver-held codebook
  * ([[Kernels.nearestCentroid]]): emits `struct(cluster INT, dist_sq DOUBLE)`
  * in one fused O(k·d) loop. The codebook is attached as a codegen REFERENCE
  * OBJECT, so the expression tree (and the generated Java) stays O(1) no
  * matter how many centroids — unlike a fold of `when(d < acc, …)` branches,
  * which grows the tree O(k) and falls out of codegen in the hundreds.
  * Ties break toward the lower cluster id; the k-means assignment step.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("nearest_centroid", child -> KernelTypes.numArray)

  require(centroids.nonEmpty, "nearest_centroid: codebook must be non-empty")
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist_sq", DoubleType, nullable = false)))
  private lazy val vf = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    Kernels.nearestCentroid(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], centroids, vf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.nearestCentroid($c, $ref, $vf)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
}

/** Morton (Z-order) interleave of two long keys' low 32 bits — sort by this
  * to cluster a table for multi-column min/max file skipping
  * ([[Kernels.zOrder2]]). */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("zorder2", left -> KernelTypes.long, right -> KernelTypes.long)

  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(Kernels.zOrder2(a.asInstanceOf[Long], b.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Kernels.zOrder2($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

/** Cosine similarity of two equal-length numeric arrays, computed in double
  * in one fused pass (dot and both norms together). Zero-norm inputs yield
  * 0.0. Used on the ANN hot path: one static-call eval per candidate pair.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("cosine_sim", left -> KernelTypes.numArray, right -> KernelTypes.numArray)

  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(Kernels.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lf, rf))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Kernels.cosine($x, $y, $lf, $rf)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Iceberg `bucket[N]` partition transform of a long key (r15 — the
  * write-side twin of [[graft.sources.IcebergRead.prunedDataFilesByKey]]'s
  * probe hash; both delegate to
  * [[graft.sources.IcebergTransforms.bucketLong]], the spec's murmur3 over
  * the 8-byte little-endian form, `(h & Int.MaxValue) % N`). Codegen'd, so
  * bucketed table layout is a plain projection in the write pipeline. */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"iceberg_bucket: N must be positive, got $n")
  override def dataType: DataType = IntegerType
  private lazy val isString = child.dataType == StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket expects an integer or string key, got $other")
    }
  override def nullSafeEval(input: Any): Any = java.lang.Integer.valueOf(
    if (isString)
      graft.sources.IcebergTransforms.bucketString(input.toString, n)
    else
      graft.sources.IcebergTransforms.bucketLong(input.asInstanceOf[Number].longValue(), n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev,
        c => s"graft.sources.IcebergTransforms.bucketString($c.toString(), $n)")
    else
      defineCodeGen(ctx, ev, c => s"graft.sources.IcebergTransforms.bucketLong((long) $c, $n)")
  override protected def withNewChildInternal(c: Expression): IcebergBucket = copy(child = c)
}

/** REAL image decode via the JVM's ImageIO registry (r15 — the codec the
  * r14 multimodal family stubbed; [[Kernels.imageDecode]]): binary payload →
  * `struct(width INT, height INT, gray ARRAY<INT>)`, the row-major luma grid
  * (raw raster for single-band images — PNG gray round trips are
  * pixel-exact — integer BT.601 for color). Undecodable bytes evaluate to
  * NULL, the quarantine path, so the expression is nullable even over a
  * non-null child.
  */
case class ImageDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("image_decode", child -> KernelTypes.binary)

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("gray", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Kernels.imageDecode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Kernels.imageDecode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): ImageDecode = copy(child = c)
}

/** REAL audio decode via the JVM's sampled-audio registry (r15 —
  * [[Kernels.wavDecode]]): binary payload → `struct(sample_rate INT,
  * channels INT, samples ARRAY<INT>)` with interleaved integer PCM values
  * (WAV/AIFF/AU, 8/16-bit PCM). Non-audio or non-PCM bytes evaluate to
  * NULL — quarantine, not failure. */
case class WavDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("wav_decode", child -> KernelTypes.binary)

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Kernels.wavDecode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Kernels.wavDecode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(c: Expression): WavDecode = copy(child = c)
}

/** REAL WAV encode ([[Kernels.wavEncode]]): 16-bit signed PCM mono samples
  * + rate → a genuine RIFF/WAVE byte stream (AudioSystem writer; the
  * [[WavDecode]] of the result returns the samples exactly). */
case class WavEncode(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("wav_encode", left -> KernelTypes.intArray, right -> KernelTypes.int)

  override def dataType: DataType = BinaryType
  override def nullSafeEval(samples: Any, rate: Any): Any =
    Kernels.wavEncode(samples.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      rate.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, r) => s"graft.functions.Kernels.wavEncode($s, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WavEncode =
    copy(left = l, right = r)
}

/** REAL PNG encode ([[Kernels.pngEncode]]): row-major grayscale grid +
  * dimensions → a genuine PNG byte stream (ImageIO writer, lossless — the
  * [[ImageDecode]] of the result is pixel-identical). Dimension/pixel-count
  * mismatches fail loudly. */
case class PngEncode(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypes.check("png_encode", first -> KernelTypes.intArray, second -> KernelTypes.int, third -> KernelTypes.int)

  override def dataType: DataType = BinaryType
  override def nullSafeEval(gray: Any, w: Any, h: Any): Any =
    Kernels.pngEncode(gray.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w, h) => s"graft.functions.Kernels.pngEncode($g, $w, $h)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): PngEncode = copy(first = a, second = b, third = c)
}
