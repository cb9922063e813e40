package graft.operators

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document near-duplicate detection: exact n-gram Jaccard via an inverted
  * shingle index, MinHash+LSH banding, and SimHash Hamming banding.
  *
  * Scale design (100 TB): no cross join anywhere. Candidate generation always
  * shuffles once on a bounded key — `shingle` for the inverted index,
  * `(band, bucket)` for LSH/SimHash — and only candidate pairs (a vanishing
  * fraction of the N² pair space) ever materialize. Signatures are computed by
  * the single-pass native kernels in [[graft.functions]] (one array traversal
  * per document for all 64 permutations).
  */
object NearDup {

  /** Distinct word 3-gram shingles of the lowercased ASCII tokens.
    * Out-of-range positions contribute empty strings (mirrors the DuckDB
    * oracle's `coalesce(w[i],'')`), so one-token docs still shingle.
    */
  def wordShingles3(text: Column): Column = {
    val w = ascii_tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - 2, lit(1))),
      i => concat(
        coalesce(try_element_at(w, i), lit("")), lit(" "),
        coalesce(try_element_at(w, i + 1), lit("")), lit(" "),
        coalesce(try_element_at(w, i + 2), lit("")))))
  }

  /** `(doc_id, shingles)` prep used by all the near-dup paths. */
  def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wordShingles3(col("text")).as("shingles"))

  private def jaccardOfCandidates(cand: DataFrame, sets: DataFrame, minJaccard: Double): DataFrame = {
    val a = sets.select(col("doc_id").as("id_a"), col("shingles").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("shingles").as("sb"))
    cand
      .join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_common"),
        (size(col("sa")) + size(col("sb"))).cast("long").as("n_ab"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("n_ab") - col("n_common")).as("n_union"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy("id_a", "id_b")
  }

  /** Exact all-pairs n-gram Jaccard ≥ τ via an inverted index: explode
    * shingles, self-join on the shingle (one shuffle), count shared shingles
    * per pair, derive the union from per-doc set sizes. Any pair with J > 0
    * shares ≥1 shingle, so recall is exact; pairs sharing nothing never
    * materialize.
    */
  def exactJaccardPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    val sets = shingled(docs)
    val inv = sets.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val common = inv.as("a").join(inv.as("b"), "shingle")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = sets.select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy("id_a", "id_b")
  }

  /** MinHash(64) + LSH(16 bands × 4 rows) near-dup pairs with exact-Jaccard
    * verification of candidates. For J ≥ 0.9 pairs the per-pair miss
    * probability is (1−0.9⁴)¹⁶ ≈ 4e-8; candidates are then verified with the
    * true Jaccard, so the output equals the exact pair set with overwhelming
    * probability while only bucket-colliding pairs are ever scored.
    */
  def minhashLshPairs(docs: DataFrame, minJaccard: Double,
      numPerms: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numPerms / bands
    val sets = shingled(docs)
    val sig = sets.select(col("doc_id"),
      minhash_signature(col("shingles"), numPerms).as("sig"))
    val banded = sig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rows) + lit(1), lit(rows))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    jaccardOfCandidates(cand, sets, minJaccard)
  }

  /** SimHash(64-bit) pairs within Hamming distance k, found exactly via
    * pigeonhole banding: split the 64 bits into k+1 chunks — k flipped bits
    * cannot touch all k+1 chunks, so every qualifying pair collides on at
    * least one exact-match chunk. Output is exact (collisions are re-checked
    * with `bit_count(a^b)`), yet only chunk-colliding pairs are compared.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val hashes = docs.select(col("doc_id"),
      simhash64(ascii_tokens(col("text"))).as("h"))
    val banded = hashes.select(col("doc_id"), col("h"),
        posexplode(array((0 until chunks).map(b =>
          shiftrightunsigned(col("h"), b * width)
            .bitwiseAND(lit((1L << width) - 1))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    banded.as("a").join(banded.as("b"), Seq("band", "chunk"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }
}
