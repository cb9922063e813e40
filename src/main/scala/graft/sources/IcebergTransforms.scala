package graft.sources

/** The Iceberg partition TRANSFORMS shared by the exporter (spec emission +
  * partition-value typing, [[graft.sinks.IcebergExport]]) and the
  * independent reader (predicate projection / probe hashing,
  * [[IcebergRead]]) — r15, VERDICT r14 "Next round" #3, extending the r14
  * fixed-width day/hour pair to the full spec set a real warehouse lays
  * out with (Iceberg table spec, "Partition Transforms"):
  *
  *  - `day` / `hour`: fixed-width in micros — ordinal = floorDiv(micros,
  *    unit); result type int (day carries the date logical type).
  *  - `month` / `year`: CALENDAR-width — ordinals are months/years since
  *    1970-01 via proleptic-Gregorian date arithmetic, still MONOTONE in
  *    micros, so range predicates project exactly; result type int.
  *  - `bucket[N]`: the Iceberg 32-bit Murmur3 of the value's single-value
  *    binary form (long → 8-byte little-endian — ints hash as longs per
  *    the spec, so bucket assignment survives int→long promotion; string →
  *    UTF-8 bytes), then `(hash & Int.MaxValue) % N`. NOT order-preserving:
  *    only equality probes project through it.
  *  - `truncate[W]`: `v - (((v % W) + W) % W)` for integers (the
  *    floor-to-width the spec defines for negatives too), first-W-chars
  *    for strings; monotone, so ranges project.
  *
  * The Murmur3 here is the PUBLIC x86 32-bit algorithm (Austin Appleby,
  * public domain; the same function Iceberg's spec pins with
  * `bucket[16]('iceberg') = 1210000089`) implemented directly so bucket
  * values cannot drift with a host library's tail-handling quirks.
  */
object IcebergTransforms {

  sealed trait Transform { def name: String }
  case object Day extends Transform { val name = "day" }
  case object Hour extends Transform { val name = "hour" }
  case object Month extends Transform { val name = "month" }
  case object Year extends Transform { val name = "year" }
  final case class Bucket(n: Int) extends Transform { val name = s"bucket[$n]" }
  final case class Truncate(w: Long) extends Transform { val name = s"truncate[$w]" }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Parse a spec transform string; None for identity/void/unknown. */
  def parse(t: String): Option[Transform] = t match {
    case "day"          => Some(Day)
    case "hour"         => Some(Hour)
    case "month"        => Some(Month)
    case "year"         => Some(Year)
    case BucketRe(n)    => Some(Bucket(n.toInt)).filter(_.n > 0)
    case TruncateRe(w)  => Some(Truncate(w.toLong)).filter(_.w > 0)
    case _              => None
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  private def localDate(micros: Long): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(Math.floorDiv(micros, MicrosPerDay))

  /** Ordinal of a MONOTONE (non-bucket) transform over a micros timestamp. */
  def timeOrdinal(t: Transform, micros: Long): Long = t match {
    case Day   => Math.floorDiv(micros, MicrosPerDay)
    case Hour  => Math.floorDiv(micros, MicrosPerHour)
    case Month => val d = localDate(micros); (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
    case Year  => (localDate(micros).getYear - 1970).toLong
    case other => throw new IllegalArgumentException(
      s"${other.name} is not a time transform")
  }

  /** truncate[W] of an integer value (floor-to-width, negatives included). */
  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)

  /** bucket[N] of an integer value (int/long — the spec hashes both as the
    * 8-byte little-endian long, so promotion preserves buckets). */
  def bucketLong(v: Long, n: Int): Int = {
    val h = murmur3Long(v, 0)
    ((h & Int.MaxValue) % n)
  }

  /** bucket[N] of a string value (UTF-8 bytes). */
  def bucketString(s: String, n: Int): Int = {
    val h = murmur3Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
    ((h & Int.MaxValue) % n)
  }

  // ---- Murmur3 x86 32-bit (public algorithm; Iceberg spec Appendix B) ----

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  private def mixK1(k1In: Int): Int = {
    var k1 = k1In * C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 * C2
  }

  private def mixH1(h1In: Int, k1: Int): Int = {
    var h1 = h1In ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  private def fmix(h1In: Int, len: Int): Int = {
    var h1 = h1In ^ len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Murmur3_x86_32 of the 8-byte little-endian form of a long: the two
    * 4-byte blocks are the low and high ints, in that order. */
  def murmur3Long(v: Long, seed: Int): Int = {
    var h1 = mixH1(seed, mixK1(v.toInt))
    h1 = mixH1(h1, mixK1((v >>> 32).toInt))
    fmix(h1, 8)
  }

  /** Standard Murmur3_x86_32 over a byte array (little-endian 4-byte
    * blocks, standard unmixed-tail handling). */
  def murmur3Bytes(bytes: Array[Byte], seed: Int): Int = {
    val nBlocks = bytes.length / 4
    var h1 = seed
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      val k1 = (bytes(base) & 0xff) | ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) | ((bytes(base + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k1))
      i += 1
    }
    var k1 = 0
    val tail = nBlocks * 4
    (bytes.length & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
        h1 ^= mixK1(k1)
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
        h1 ^= mixK1(k1)
      case 1 =>
        k1 ^= bytes(tail) & 0xff
        h1 ^= mixK1(k1)
      case _ =>
    }
    fmix(h1, bytes.length)
  }
}
