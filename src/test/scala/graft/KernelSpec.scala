package graft

import graft.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit tests for the native Catalyst kernels against independent
  * reimplementations. */
class KernelSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash matches a straightforward Horner reimplementation") {
    val inputs = Seq("", "a", "abc xyz", "the quick brown fox", "0 9 z")
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % 1000000007L)
    val got = inputs.toDF("s").select(rolling_hash($"s")).as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
  }

  test("cosine_sim matches a sequential double-accumulation reimplementation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    def ref(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val got = Seq((a, b)).toDF("a", "b").select(cosine_sim($"a", $"b")).as[Double].head()
    assert(got == ref(a, b))
    val zero = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(cosine_sim($"a", $"b")).as[Double].head()
    assert(zero == 0.0)
  }

  test("word_shingles matches the padded-3-gram semantics incl. short docs") {
    val got = Seq("The quick brown fox jumps", "one", "two words", "", "A!B")
      .toDF("s").select(word_shingles($"s")).as[Seq[String]].collect()
    assert(got(0) == Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(got(1) == Seq("one  "))
    assert(got(2) == Seq("two words "))
    assert(got(3) == Seq("  "))
    assert(got(4) == Seq("a b "))
  }

  test("word_shingles dedups repeated shingles") {
    val got = Seq("a b a b a b a b").toDF("s")
      .select(word_shingles($"s")).as[Seq[String]].head()
    assert(got.toSet == Set("a b a", "b a b"))
    assert(got.size == 2)
  }

  test("minhash signature estimates Jaccard and bands are consistent slices") {
    // two token sets with known overlap: J = 50/150 ≈ 0.33
    val xs = (1 to 100).map(i => s"tok$i")
    val ys = (51 to 150).map(i => s"tok$i")
    val df = Seq(xs, ys).toDF("sh")
    val sigs = df.select(minhash_signature($"sh", 256)).as[Seq[Long]].collect()
    val agree = sigs(0).zip(sigs(1)).count { case (p, q) => p == q }
    val est = agree.toDouble / 256
    assert(math.abs(est - 1.0 / 3) < 0.12, s"minhash J estimate $est far from 1/3")
    // identical input -> identical bands; deterministic across evaluations
    val b1 = df.select(minhash_bands($"sh", 64, 16)).as[Seq[Long]].collect()
    val b2 = df.select(minhash_bands($"sh", 64, 16)).as[Seq[Long]].collect()
    assert(b1.toSeq == b2.toSeq && b1(0).size == 16)
  }

  test("simhash chunks partition the simhash64 bits exactly") {
    val df = Seq(Seq("spark", "flink", "iceberg", "snowflake")).toDF("toks")
    val h = df.select(simhash64($"toks")).as[Long].head()
    val chunks = df.select(simhash_chunks($"toks", 4)).as[Seq[Long]].head()
    val rebuilt = chunks.zipWithIndex.map { case (c, i) => c << (i * 16) }.reduce(_ | _)
    assert(rebuilt == h)
  }

  test("simhash chunks lose no bits when chunks does not divide 64") {
    val df = Seq(Seq("spark", "flink", "iceberg", "snowflake")).toDF("toks")
    val h = df.select(simhash64($"toks")).as[Long].head()
    for (n <- Seq(3, 5, 6, 7, 9, 63, 64)) {
      val width = 64 / n
      val chunks = df.select(simhash_chunks($"toks", n)).as[Seq[Long]].head()
      assert(chunks.size == n)
      val rebuilt = chunks.zipWithIndex.map { case (c, i) => c << (i * width) }.reduce(_ | _)
      assert(rebuilt == h, s"chunks=$n dropped bits: ${rebuilt.toHexString} != ${h.toHexString}")
    }
  }

  test("minhash_bands rejects a band count that does not divide the permutations") {
    intercept[IllegalArgumentException] {
      graft.functions.MinHashBands(
        org.apache.spark.sql.catalyst.expressions.Literal(null), numPerms = 64, bands = 12)
    }
  }

  test("sign_random_projection is deterministic and seed-sensitive") {
    val v = Array.tabulate(16)(i => (i * 0.37f - 2f))
    val df = Seq(v).toDF("v")
    val a1 = df.select(sign_random_projection($"v", 16, 7)).as[Int].head()
    val a2 = df.select(sign_random_projection($"v", 16, 7)).as[Int].head()
    val b = df.select(sign_random_projection($"v", 16, 8)).as[Int].head()
    assert(a1 == a2)
    assert(a1 != b) // 1/65536 collision chance for these fixed seeds
  }

  test("unicode normalization: NFC canonical equivalence, NFKC compatibility folds, casefold (r16)") {
    def one(c: org.apache.spark.sql.Column): String =
      Seq("x").toDF("d").select(c).as[String].head()
    // canonical: composed U+00E1 == NFC(decomposed a + U+0301)
    assert(one(nfc_normalize(lit("café"))) == one(nfc_normalize(lit("café"))))
    // NFC leaves compatibility forms alone; NFKC folds them
    assert(one(nfc_normalize(lit("ＡＢ"))) == "ＡＢ") // fullwidth AB stays
    assert(one(nfkc_normalize(lit("ＡＢ"))) == "AB")          // NFKC folds width
    assert(one(nfkc_normalize(lit("ﬁle"))) == "file")            // ﬁ ligature
    assert(one(nfkc_normalize(lit("１２３"))) == "123")   // fullwidth digits
    // idempotence + ASCII fast path
    val ascii = "plain ascii stays untouched 123"
    assert(one(nfc_normalize(lit(ascii))) == ascii)
    assert(one(nfkc_normalize(nfkc_normalize(lit("Ａé")))) ==
      one(nfkc_normalize(lit("Ａé"))))
    // casefold: beyond lower() — ß folds to ss, final sigma to σ
    assert(one(unicode_casefold(lit("STRAßE"))) == "strasse")
    assert(one(unicode_casefold(lit("Σις"))) ==
      one(unicode_casefold(lit("σισ"))))
    // the property that makes it a dedup key: fold(x) == fold(fold(x))
    Seq("CAFÉ", "Straße Ａ", "ΣΣ").foreach { x =>
      assert(one(unicode_casefold(lit(x))) ==
        one(unicode_casefold(unicode_casefold(lit(x)))))
    }
    // null propagation through all three
    val r = Seq(Tuple1[String](null)).toDF("s")
      .select(nfc_normalize($"s"), nfkc_normalize($"s"), unicode_casefold($"s")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // misuse fails at ANALYSIS with the function name, not at codegen
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(nfc_normalize($"n")).collect()
    }
    assert(e.getMessage.contains("nfc_normalize"))
  }
}
