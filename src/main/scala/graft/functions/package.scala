package graft

import org.apache.spark.sql.{Column, SparkSession}
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

  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))

  def word_shingles(c: Column, n: Int = 3): Column = toCol(WordShingles(toExpr(c), n))

  def minhash_bands(c: Column, numPerms: Int = 64, bands: Int = 16): Column =
    toCol(MinHashBands(toExpr(c), numPerms, bands))

  def simhash_chunks(c: Column, chunks: Int = 8): Column =
    toCol(SimHashChunks(toExpr(c), chunks))

  /** SQL registration, so the kernels are callable from spark.sql(...). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature", es => MinHashSignature(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sign_random_projection", es => SignRandomProjection(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles", es => WordShingles(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands", es => MinHashBands(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_chunks", es => SimHashChunks(es.head), "scala_udf")
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
