package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based kernel verification: every custom Catalyst kernel is
  * checked against an independent pure-Scala reimplementation over hundreds
  * of ScalaCheck-generated inputs (fixed seeds — deterministic CI). Inputs
  * batch through ONE DataFrame pass per property, so the kernels run through
  * the real codegen path, not just `nullSafeEval`.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  /** ASCII text with letters/digits/space/punct (the corpus alphabet —
    * unicode case-folding is out of contract for the [a-z] tokenizers). */
  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar, 3 -> Gen.const(' '),
      1 -> Gen.numChar, 1 -> Gen.oneOf('!', '.', ',', '-', '_', '\'')))
      .map(_.mkString)

  private val tokenArray: Gen[Seq[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)).map(_.toSeq)

  test("property: word_shingles(n) == naive reference for n in 2..5") {
    val texts = gen(asciiText, 300, 42L)
    def ref(s: String, n: Int): Seq[String] = {
      val t = "[a-z]+".r.findAllIn(s.toLowerCase).toVector
      val count = math.max(t.length - (n - 1), 1)
      (0 until count)
        .map(j => (0 until n).map(k => if (j + k < t.length) t(j + k) else "").mkString(" "))
        .distinct
    }
    for (n <- 2 to 5) {
      val got = texts.toDF("s").select(word_shingles($"s", n)).as[Seq[String]].collect()
      assert(got.toSeq == texts.map(ref(_, n)), s"n=$n")
    }
  }

  test("property: rolling_hash == BigInt Horner for two (base, mod) pairs") {
    val texts = gen(asciiText, 300, 7L)
    for ((b, m) <- Seq((31L, 1000000007L), (131L, 998244353L))) {
      def ref(s: String): Long =
        s.getBytes("UTF-8").foldLeft(BigInt(0))((h, byte) => (h * b + (byte & 0xFF)) % m).toLong
      val got = texts.toDF("s").select(rolling_hash($"s", b, m)).as[Long].collect()
      assert(got.toSeq == texts.map(ref), s"base=$b mod=$m")
    }
  }

  test("property: simhash_chunks reassemble to simhash64 for EVERY chunk count 1..64") {
    val arrays = gen(tokenArray, 60, 11L)
    val df = arrays.toDF("toks")
    val cols = simhash64($"toks").as("sim") +:
      (1 to 64).map(k => simhash_chunks($"toks", k).as(s"c$k"))
    val rows = df.select(cols: _*).collect()
    for (r <- rows; k <- 1 to 64) {
      val sim = r.getLong(0)
      val width = 64 / k
      val chunks = r.getSeq[Long](k)
      val rebuilt = chunks.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
        acc | (c << (i * width))
      }
      assert(rebuilt == sim, s"k=$k chunks=$chunks sim=$sim")
    }
  }

  test("property: minhash_bands == FNV fold of minhash_signature runs") {
    val arrays = gen(tokenArray, 100, 23L)
    for ((perms, bands) <- Seq((64, 16), (64, 8), (32, 4), (16, 16))) {
      val rows = perms / bands
      val got = arrays.toDF("toks")
        .select(minhash_signature($"toks", perms).as("sig"),
          minhash_bands($"toks", perms, bands).as("bnd"))
        .as[(Seq[Long], Seq[Long])].collect()
      for ((sig, bnd) <- got) {
        val want = (0 until bands).map { b =>
          (0 until rows).foldLeft(1125899906842597L)((acc, r) => acc * 31 + sig(b * rows + r))
        }
        assert(bnd == want, s"perms=$perms bands=$bands")
      }
    }
  }

  test("property: cosine_sim == sequential fused reference, bit-exact") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-8.0f, 8.0f)).map(_.toArray)
    val pairs = gen(Gen.zip(vec, vec), 200, 31L)
    def ref(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val got = pairs.toDF("a", "b").select(cosine_sim($"a", $"b")).as[Double].collect()
    for (((a, b), g) <- pairs.zip(got)) assert(g == ref(a, b))
  }

  test("property: z_order interleave is a bijection on 32-bit pairs (deinterleave recovers inputs)") {
    val pairs = gen(Gen.zip(Gen.chooseNum(0L, 0xFFFFFFFFL), Gen.chooseNum(0L, 0xFFFFFFFFL)), 300, 71L)
    def extract(z: Long, offset: Int): Long = {
      var out = 0L
      var i = 0
      while (i < 32) { out |= ((z >>> (2 * i + offset)) & 1L) << i; i += 1 }
      out
    }
    val got = pairs.toDF("a", "b").select(z_order($"a", $"b")).as[Long].collect()
    for (((a, b), z) <- pairs.zip(got)) {
      assert(extract(z, 0) == a && extract(z, 1) == b, s"z=$z a=$a b=$b")
    }
    // monotone in each arg with the other fixed at 0 (prefix-order property)
    val xs = pairs.map(_._1).sorted
    val zs = xs.toDF("a").select(z_order($"a", lit(0L))).as[Long].collect()
    assert(zs.toSeq == zs.sorted.toSeq, "z_order(a, 0) must be monotone in a")
  }

  test("property: sign_random_projection stays within [0, 2^bits) and is input-deterministic") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-4.0f, 4.0f)).map(_.toArray)
    val vs = gen(vec, 150, 57L)
    for (bits <- Seq(4, 12, 16)) {
      val got = vs.toDF("v").select(sign_random_projection($"v", bits)).as[Int].collect()
      val again = vs.toDF("v").select(sign_random_projection($"v", bits)).as[Int].collect()
      assert(got.toSeq == again.toSeq, "not deterministic")
      assert(got.forall(x => x >= 0 && x < (1 << bits)), s"bucket out of range at bits=$bits")
    }
  }

  test("property: png_encode -> image_decode is the identity on random grids (r15)") {
    // PNG is lossless: 80 random (w, h, pixels) triples must round-trip
    // bit-exactly through the REAL ImageIO codec, whatever the dims
    val dims = gen(for {
      w <- Gen.chooseNum(1, 40); h <- Gen.chooseNum(1, 40)
    } yield (w, h), 80, 7L)
    val rows = dims.zipWithIndex.map { case ((w, h), i) =>
      val rnd = new scala.util.Random(1000L + i)
      (Seq.fill(w * h)(rnd.nextInt(256)), w, h)
    }
    val got = rows.toDF("g", "w", "h")
      .select(image_decode(png_encode($"g", $"w", $"h")).as("d"))
      .select($"d.width", $"d.height", $"d.gray")
      .as[(Int, Int, Seq[Int])].collect().toSeq
    assert(got == rows.map { case (g, w, h) => (w, h, g) })
  }

  test("property: wav_encode -> wav_decode is the identity on random PCM trains (r15)") {
    val lens = gen(Gen.chooseNum(1, 2000), 60, 11L)
    val rows = lens.zipWithIndex.map { case (n, i) =>
      val rnd = new scala.util.Random(2000L + i)
      (Seq.fill(n)(rnd.nextInt(65536) - 32768), 4000 + (i % 5) * 4000)
    }
    val got = rows.toDF("s", "r")
      .select(wav_decode(wav_encode($"s", $"r")).as("d"))
      .select($"d.sample_rate", $"d.channels", $"d.samples")
      .as[(Int, Int, Seq[Int])].collect().toSeq
    assert(got == rows.map { case (s, r) => (r, 1, s) })
  }
}
