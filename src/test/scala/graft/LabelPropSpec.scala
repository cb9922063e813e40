package graft

import graft.operators.LabelProp

/** Label-propagation invariants: communities localize on a barbell graph
  * (two cliques bridged by one edge keep distinct labels), the engine's
  * struct-argmax iterate matches a sequential Scala replay of the same
  * min-label-tie-break recurrence on the sf0.001 co-purchase graph, and
  * reliable-checkpoint mode is bit-identical to executor-local mode.
  */
class LabelPropSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def undirected(pairs: Seq[(Long, Long)]) = {
    val e = pairs ++ pairs.map { case (a, b) => (b, a) }
    e.toDF("src", "dst")
  }

  /** Sequential replay of the synchronous recurrence: label ← most frequent
    * in-neighbor label, tie → smallest. */
  private def replay(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var lab = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = in.map { case (node, srcs) =>
        val counts = srcs.groupBy(lab).view.mapValues(_.size).toMap
        node -> counts.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    lab
  }

  // two 4-cliques {1..4} and {11..14} bridged by (4, 11)
  private val cliqueA = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
  private val cliqueB = for { a <- 11L to 14L; b <- 11L to 14L if a < b } yield (a, b)
  private val barbell = cliqueA ++ cliqueB ++ Seq((4L, 11L))

  test("barbell graph: the two cliques keep separate communities") {
    val got = LabelProp.run(undirected(barbell), rounds = 4)
      .as[(Long, Long)].collect().toMap
    val la = (1L to 4L).map(got)
    val lb = (11L to 14L).map(got)
    assert(la.toSet.size == 1 && lb.toSet.size == 1,
      s"each clique should agree on one label, got $got")
    assert(la.head != lb.head, s"cliques should differ, got $got")
    assert(got == replay(undirected(barbell).as[(Long, Long)].collect().toSeq, 4))
  }

  test("engine matches the sequential replay on the sf0.001 co-purchase graph") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val e0 = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") =!= col("b.l_partkey"))
      .select(least(col("a.l_partkey"), col("b.l_partkey")).as("u"),
        greatest(col("a.l_partkey"), col("b.l_partkey")).as("v"))
      .distinct()
    val e = e0.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(e0.select(col("v").as("src"), col("u").as("dst")))
    val got = LabelProp.run(e, rounds = 4).as[(Long, Long)].collect().toMap
    val want = replay(e.as[(Long, Long)].collect().toSeq, 4)
    assert(got == want)
  }

  test("reliable checkpoint mode is bit-identical to local mode") {
    val dir = java.nio.file.Files.createTempDirectory("lp-ckpt").toString
    val a = LabelProp.run(undirected(barbell), rounds = 4, checkpointDir = None)
      .as[(Long, Long)].collect().toSet
    val b = LabelProp.run(undirected(barbell), rounds = 4, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
