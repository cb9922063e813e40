package graft

import graft.operators.Dtw

/** Dtw: the rolling two-row DP equals a full-matrix reference, is zero on
  * identical series and symmetric, tolerates a one-step shift where
  * pointwise L1 does not, and pairDistances wires the per-pair calls
  * exactly.
  */
class DtwSpec extends SparkSpec {
  import spark.implicits._

  private def full(a: Array[Long], b: Array[Long]): Long = {
    val inf = Long.MaxValue / 4
    val d = Array.fill(a.length + 1, b.length + 1)(inf)
    d(0)(0) = 0L
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(math.min(d(i - 1)(j), d(i)(j - 1)), d(i - 1)(j - 1))
    d(a.length)(b.length)
  }

  test("rolling DP equals the full-matrix reference on random series") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 30) {
      val a = Array.fill(1 + rnd.nextInt(40))(rnd.nextLong(1000L) - 500L)
      val b = Array.fill(1 + rnd.nextInt(40))(rnd.nextLong(1000L) - 500L)
      assert(Dtw.dtw(a, b) == full(a, b))
      assert(Dtw.dtw(a, b) == Dtw.dtw(b, a)) // symmetric costs
    }
  }

  test("identical series cost 0; a one-step shift is cheap where L1 is not") {
    val a = (0 until 50).map(i => ((i % 10) * 100).toLong).toArray
    assert(Dtw.dtw(a, a) == 0L)
    val shifted = a.drop(1) :+ a.last
    val l1 = a.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    val dtwCost = Dtw.dtw(a, shifted)
    assert(dtwCost < l1 / 10, s"dtw $dtwCost not << L1 $l1")
  }

  test("pairDistances emits every unordered pair with the exact per-pair cost") {
    val series = Seq(
      (1L, Seq(1L, 2L, 3L, 4L)),
      (2L, Seq(4L, 3L, 2L, 1L)),
      (3L, Seq(1L, 2L, 3L, 4L, 5L)))
    val got = Dtw.pairDistances(series.toDF("id", "vs"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val want = for {
      (ia, va) <- series; (ib, vb) <- series if ia < ib
    } yield (ia, ib, Dtw.dtw(va.toArray, vb.toArray))
    assert(got == want.sortBy(r => (r._1, r._2)))
  }
}
