package graft

/** Byte-level replays of the perceptual-hash fingerprints: aHash and dHash
  * recompute bit-for-bit from the raw document bytes in plain Scala, and the
  * dHash invariance claim — a global brightness shift changes aHash inputs
  * but not adjacent-block ORDER — is proven directly on the block sums.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def blockSums(text: String): Vector[Long] = {
    val padded = text.padTo(252, ' ').take(252)
    val bytes = padded.map(_.toInt.toLong).toVector
    (0 to 62).map(b => bytes.slice(b * 4, b * 4 + 4).sum).toVector
  }

  private lazy val docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .select("doc_id", "text").as[(Long, String)].collect()
    .filter(_._2.nonEmpty)

  test("multimodal_dhash recomputes bit-for-bit from the raw bytes") {
    val got = SparkEntry.queries("multimodal_dhash")(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, t) =>
      val bs = blockSums(t)
      val want = (0 until 62).map { k =>
        if (bs(k) > bs(k + 1)) 1L << k else 0L
      }.sum
      assert(got(id) == want, s"dhash mismatch at doc $id")
      assert(got(id) >= 0L && got(id) < (1L << 62))
    }
  }

  test("multimodal_ahash recomputes bit-for-bit from the raw bytes") {
    val got = SparkEntry.queries("multimodal_ahash")(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, t) =>
      val bs = blockSums(t)
      val total = bs.sum
      val want = bs.zipWithIndex.collect {
        case (v, i) if v * 63 > total => 1L << i
      }.sum
      assert(got(id) == want, s"ahash mismatch at doc $id")
    }
  }

  test("dhash block-order bits are invariant under a global brightness shift") {
    // shift every 'pixel' (byte) by +5: every block sum moves by +20, so
    // every adjacent-block comparison — hence the dHash — is unchanged,
    // while the block-vs-mean comparison can flip (v+20)*63 > total+63*20
    // differently than v*63 > total whenever v*63 ≠ total scales.
    val shifted = docs.map { case (_, t) => blockSums(t).map(_ + 20L) }
    val orig = docs.map { case (_, t) => blockSums(t) }
    orig.zip(shifted).foreach { case (a, b) =>
      val dA = (0 until 62).map(k => a(k) > a(k + 1))
      val dB = (0 until 62).map(k => b(k) > b(k + 1))
      assert(dA == dB, "dhash bits moved under a constant shift")
    }
  }
}
