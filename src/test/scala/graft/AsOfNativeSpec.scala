package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom physical as-of join (plans.AsOfJoinPlan/Exec): output-identical
  * to the declarative union+window operator in both directions, correct on
  * adversarial key/time layouts (keys with no right rows, simultaneous
  * timestamps, out-of-range times), and the plan carries the SMJ contract —
  * both children exchange-partitioned by key, NO Window operator anywhere.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (event, key, t)
    (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 200L), (4L, 10L, 999L),
    (5L, 20L, 50L), (6L, 20L, 500L),
    (7L, 30L, 1L) // key with no right rows at all
  ).toDF("event_id", "k", "t")

  private val right = Seq(
    // (key, rt, v)
    (10L, 100L, "a"), (10L, 150L, "b"), (10L, 1000L, "c"),
    (20L, 60L, "x"), (20L, 500L, "y"),
    (40L, 5L, "zzz") // key with no left rows
  ).toDF("rk", "rt", "v")
    .select($"rk", $"rt", $"rt".as("asof_t"), $"v")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select($"event_id", $"asof_t", $"v").orderBy($"event_id")
      .as[(Long, Option[Long], Option[String])].collect().toSeq

  test("backward: native equals the union+window operator, including misses") {
    val a = collect(AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt",
      Seq("asof_t", "v")))
    val b = collect(AsOfJoin.leftAsOfNative(left, right, "k", "rk", "t", "rt",
      Seq("asof_t", "v")))
    assert(a == b, s"\nwindow: $a\nnative: $b")
    // hand-check the semantics: inclusive at equal times (event 1 @100
    // matches right @100), carry (event 4 @999 still sees b@150), miss
    // (event 7, key 30) is null
    assert(b == Seq(
      (1L, Some(100L), Some("a")), (2L, Some(150L), Some("b")),
      (3L, Some(150L), Some("b")), (4L, Some(150L), Some("b")),
      (5L, None, None), (6L, Some(500L), Some("y")),
      (7L, None, None)), b.toString)
  }

  test("forward: native equals the union+window operator") {
    val a = collect(AsOfJoin.leftAsOfForward(left, right, "k", "rk", "t", "rt",
      Seq("asof_t", "v")))
    val b = collect(AsOfJoin.leftAsOfNative(left, right, "k", "rk", "t", "rt",
      Seq("asof_t", "v"), forward = true))
    assert(a == b, s"\nwindow: $a\nnative: $b")
    assert(b == Seq(
      (1L, Some(100L), Some("a")), (2L, Some(1000L), Some("c")),
      (3L, Some(1000L), Some("c")), (4L, Some(1000L), Some("c")),
      (5L, Some(60L), Some("x")), (6L, Some(500L), Some("y")),
      (7L, None, None)), b.toString)
  }

  test("native equals window on the real q18 frames at sf0.001") {
    val d = sf("sf0.001")
    val a = SparkEntry.queries("q18_asof_join")(spark, d).collect().toSeq
    val b = SparkEntry.queries("asof_join_native")(spark, d).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("plan: SMJ contract — keyed exchanges on both children, no Window") {
    val df = AsOfJoin.leftAsOfNative(left, right, "k", "rk", "t", "rt",
      Seq("asof_t", "v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan)
    assert(!plan.contains("Window"), "native as-of must not fall back to a window\n" + plan)
    val keyed = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed >= 2, s"expected both children key-partitioned\n$plan")
  }

  test("tolerance: backward match staler than the bound NULLs atomically") {
    // window-encoding reference: leftAsOf + post predicate NULLing payload
    def windowed(tol: Long) =
      AsOfJoin.leftAsOf(left, right, "k", "rk", "t", "rt", Seq("asof_t", "v"))
        .withColumn("fresh", $"asof_t".isNotNull && $"t" - $"asof_t" <= tol)
        .select($"event_id",
          when($"fresh", $"asof_t").as("asof_t"), when($"fresh", $"v").as("v"))
    for (tol <- Seq(0L, 49L, 50L, 400L, 849L, 1000000L)) {
      val a = collect(windowed(tol))
      val b = collect(AsOfJoin.leftAsOfNative(left, right, "k", "rk", "t", "rt",
        Seq("asof_t", "v"), toleranceUs = Some(tol)))
      assert(a == b, s"tol=$tol\nwindow: $a\nnative: $b")
    }
    // hand-check one: tol=400 — event 4 @999 last-matched b@150, 849 stale
    val b400 = collect(AsOfJoin.leftAsOfNative(left, right, "k", "rk", "t", "rt",
      Seq("asof_t", "v"), toleranceUs = Some(400L)))
    assert(b400.find(_._1 == 4L).get == ((4L, None, None)), b400.toString)
    assert(b400.find(_._1 == 2L).get == ((2L, Some(150L), Some("b"))), b400.toString)
  }

  test("tolerance: forward match further out than the bound NULLs atomically") {
    def windowed(tol: Long) =
      AsOfJoin.leftAsOfForward(left, right, "k", "rk", "t", "rt", Seq("asof_t", "v"))
        .withColumn("fresh", $"asof_t".isNotNull && $"asof_t" - $"t" <= tol)
        .select($"event_id",
          when($"fresh", $"asof_t").as("asof_t"), when($"fresh", $"v").as("v"))
    for (tol <- Seq(0L, 10L, 800L, 1000000L)) {
      val a = collect(windowed(tol))
      val b = collect(AsOfJoin.leftAsOfNative(left, right, "k", "rk", "t", "rt",
        Seq("asof_t", "v"), forward = true, toleranceUs = Some(tol)))
      assert(a == b, s"tol=$tol\nwindow: $a\nnative: $b")
    }
  }

  test("tolerance: many keys across partitions match the window encoding") {
    val l = (1L to 500L).map(i => (i, i % 37, i * 13 % 101)).toDF("event_id", "k", "t")
    val r = (1L to 300L).map(j => (j % 41, j * 7 % 97, s"p$j")).toDF("rk", "rt", "v")
      .groupBy($"rk", $"rt").agg(max($"v").as("v"))
      .select($"rk", $"rt", $"rt".as("asof_t"), $"v")
    for (tol <- Seq(0L, 7L, 30L, 1000L)) {
      val a = collect(
        AsOfJoin.leftAsOf(l, r, "k", "rk", "t", "rt", Seq("asof_t", "v"))
          .withColumn("fresh", $"asof_t".isNotNull && $"t" - $"asof_t" <= tol)
          .select($"event_id",
            when($"fresh", $"asof_t").as("asof_t"), when($"fresh", $"v").as("v")))
      val b = collect(AsOfJoin.leftAsOfNative(l, r, "k", "rk", "t", "rt",
        Seq("asof_t", "v"), toleranceUs = Some(tol)))
      assert(a == b, s"tol=$tol")
    }
  }

  test("a NULL time fails loudly instead of coercing to 0") {
    val lNull = Seq((1L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(100L)),
        (2L, java.lang.Long.valueOf(10L), null.asInstanceOf[java.lang.Long]))
      .toDF("event_id", "k", "t")
    val e = intercept[org.apache.spark.SparkException] {
      AsOfJoin.leftAsOfNative(lNull, right, "k", "rk", "t", "rt",
        Seq("asof_t", "v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL left time")), e.toString)
  }

  test("many keys across partitions: native matches a brute-force computation") {
    val l = (1L to 500L).map(i => (i, i % 37, i * 13 % 101)).toDF("event_id", "k", "t")
    val r = (1L to 300L).map(j => (j % 41, j * 7 % 97, s"p$j")).toDF("rk", "rt", "v")
      // unique per (key, time): keep the max-v row
      .groupBy($"rk", $"rt").agg(max($"v").as("v"))
      .select($"rk", $"rt", $"rt".as("asof_t"), $"v")
    val a = collect(AsOfJoin.leftAsOf(l, r, "k", "rk", "t", "rt", Seq("asof_t", "v")))
    val b = collect(AsOfJoin.leftAsOfNative(l, r, "k", "rk", "t", "rt", Seq("asof_t", "v")))
    assert(a == b)
  }
}
