package graft

import graft.core._
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** The grid-bucketed interval join must produce EXACTLY the plain non-equi
  * join's pairs (bucketing is a pruning device, never a semantics change),
  * including once-only multiplicity — a pair double-counted by a cell overlap
  * bug would survive a rows-match check but break the aggregate counts.
  */
class RangeJoinSpec extends SparkSpec {

  private def sides() = {
    val ev = eventsTable(spark, sf("sf0.001"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
    val iv = table(spark, sf("sf0.001"), "orders")
      .select(col("o_orderkey"),
        ((col("o_orderkey") % 97).cast("double") * 5.0).as("lo"))
      .withColumn("hi", col("lo") + (col("o_orderkey") % 7 + 1).cast("double"))
    (ev, iv)
  }

  test("bucketed interval join equals the plain non-equi join, pair for pair") {
    val (ev, iv) = sides()
    for (width <- Seq(0.7, 8.0, 100.0)) { // narrower / near / wider than intervals
      val bucketed = RangeJoin.pointInInterval(ev, iv, "value", "lo", "hi", width)
        .select("event_id", "o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
      val plain = ev.join(iv, col("value") >= col("lo") && col("value") < col("hi"))
        .select("event_id", "o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(bucketed.length == plain.length, s"width=$width: pair multiplicity differs")
      assert(bucketed.sorted.sameElements(plain.sorted), s"width=$width: pair sets differ")
      assert(plain.nonEmpty, "degenerate fixture: no matching pairs")
    }
  }

  test("boundary semantics: lo inclusive, hi exclusive, exactly once on cell edges") {
    import spark.implicits._
    // points ON the grid lines and interval bounds ON the grid lines
    val pts = Seq((1L, 0.0), (2L, 10.0), (3L, 20.0), (4L, 15.0)).toDF("pid", "p")
    val ivs = Seq((100L, 0.0, 10.0), (200L, 10.0, 20.0), (300L, 0.0, 20.0))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", bucketWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(Array((1L, 100L), (1L, 300L), (2L, 200L), (2L, 300L), (4L, 200L), (4L, 300L))))
  }

  test("negative coordinates bucket correctly (floor, not truncate-toward-zero)") {
    import spark.implicits._
    val pts = Seq((1L, -0.5), (2L, -10.0), (3L, 0.5)).toDF("pid", "p")
    val ivs = Seq((100L, -1.0, 1.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", bucketWidth = 10.0)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 3L)))
  }

  test("a degenerate interval spanning too many cells fails loudly, not silently") {
    import spark.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val ivs = Seq((100L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
        bucketWidth = 1.0, maxCellsPerInterval = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("spans more than 100 cells")), ex.toString)
  }

  test("interval overlap join equals the plain non-equi join, pair for pair, at any width") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val a = (0 until 200).map { i =>
      val lo = rnd.nextInt(500).toDouble
      (i.toLong, rnd.nextInt(3).toLong, lo, lo + 1 + rnd.nextInt(40)) }
      .toDF("ida", "ka", "alo", "ahi")
    val b = (0 until 200).map { i =>
      val lo = rnd.nextInt(500).toDouble
      (i.toLong, rnd.nextInt(3).toLong, lo, lo + 1 + rnd.nextInt(40)) }
      .toDF("idb", "kb", "blo", "bhi")
    val plain = a.join(b, $"ka" === $"kb" && $"alo" < $"bhi" && $"blo" < $"ahi")
      .select($"ida", $"idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plain.nonEmpty, "degenerate fixture")
    for (width <- Seq(3.0, 20.0, 500.0)) {
      val gridded = RangeJoin.intervalOverlap(
          a.withColumnRenamed("ka", "k"), b.withColumnRenamed("kb", "k"),
          "alo", "ahi", "blo", "bhi", bucketWidth = width, keys = Seq("k"))
        .select($"ida", $"idb").collect().map(r => (r.getLong(0), r.getLong(1)))
      // same pairs AND same multiplicity: the reference-cell rule must make
      // every pair meet exactly once, with no distinct anywhere
      assert(gridded.length == plain.length,
        s"width=$width: multiplicity differs (${gridded.length} vs ${plain.length})")
      assert(gridded.sorted.sameElements(plain.sorted), s"width=$width: pair sets differ")
    }
  }

  test("interval overlap: touching endpoints do not match (half-open), containment does") {
    import spark.implicits._
    val a = Seq((1L, 0.0, 10.0), (2L, 50.0, 60.0)).toDF("ida", "alo", "ahi")
    val b = Seq((10L, 10.0, 20.0), (20L, 52.0, 54.0)).toDF("idb", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", 5.0)
      .select($"ida", $"idb").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // [0,10) touches [10,20) -> no; [50,60) contains [52,54) -> yes
    assert(got.sameElements(Array((2L, 20L))), got.mkString(","))
  }
}
