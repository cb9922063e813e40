package graft

import graft.sinks.{GraftTableWriter, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The signed delta-join identity ΔM = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB (signs
  * multiply; update = −before +after) must reproduce a from-scratch
  * recompute of A₁⋈B₁ for ARBITRARY change batches on both inputs — the
  * driver query proves one fixed mutation set against DuckDB; this spec
  * proves the identity itself under randomized inserts/updates/deletes,
  * including changes that touch the same join key on both sides at once.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def signedDelta(path: String, key: String, payload: String): DataFrame =
    VersionedTable.changesWithImages(spark, path, 1, 2, Seq(key))
      .select(col(key), explode(array(
        struct(col(s"before.$payload").as(payload), lit(-1L).as("w")),
        struct(col(s"after.$payload").as(payload), lit(1L).as("w")))).as("c"))
      .filter(col(s"c.$payload").isNotNull)
      .select(col(key), col(s"c.$payload").as(payload), col("c.w").as("w"))

  test("delta-join maintenance equals full recompute under randomized mutations") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val nA = 400; val nB = 60
      val a1r = (0 until nA).map(i => (i.toLong, (i % nB).toLong, rnd.nextInt(1000).toLong))
      val b1r = (0 until nB).map(j => (j.toLong, rnd.nextInt(1000).toLong))
      // randomized mutations: ~10% deletes, ~20% updates, a few inserts, both sides
      val a2r = a1r.filter(_ => rnd.nextDouble() > 0.1)
        .map { case (k, fk, v) =>
          if (rnd.nextDouble() < 0.2) (k, fk, v + 1 + rnd.nextInt(50).toLong) else (k, fk, v) } ++
        (0 until 20).map(i => (10000L + nA * trial + i, rnd.nextInt(nB).toLong, rnd.nextInt(1000).toLong))
      val b2r = b1r.filter(_ => rnd.nextDouble() > 0.1)
        .map { case (j, v) =>
          if (rnd.nextDouble() < 0.3) (j, v + 1 + rnd.nextInt(50).toLong) else (j, v) } ++
        (0 until 5).map(i => (20000L + nB * trial + i, rnd.nextInt(1000).toLong))

      val pA = s"/tmp/graft_tables/ivm_spec_a_$trial"
      val pB = s"/tmp/graft_tables/ivm_spec_b_$trial"
      GraftTableWriter.drop(spark, pA); GraftTableWriter.drop(spark, pB)
      val a1 = a1r.toDF("k", "fk", "va"); val a2 = a2r.toDF("k", "fk", "va")
      val b1 = b1r.toDF("j", "vb"); val b2 = b2r.toDF("j", "vb")
      VersionedTable.overwrite(a1, pA); VersionedTable.overwrite(a2, pA)
      VersionedTable.overwrite(b1, pB); VersionedTable.overwrite(b2, pB)

      // ΔA carries (fk, va) as payload struct; key = k. The fk can itself
      // change on update, so it rides in the payload like any other column.
      val dA = VersionedTable.changesWithImages(spark, pA, 1, 2, Seq("k"))
        .select($"k", explode(array(
          struct($"before.fk".as("fk"), $"before.va".as("va"), lit(-1L).as("w")),
          struct($"after.fk".as("fk"), $"after.va".as("va"), lit(1L).as("w")))).as("c"))
        .filter($"c.va".isNotNull)
        .select($"k", $"c.fk".as("fk"), $"c.va".as("va"), $"c.w".as("w"))
      val dB = signedDelta(pB, "j", "vb")

      def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
        df.select($"k", $"fk", $"va", $"vb").as[(Long, Long, Long, Long)]
          .collect().toSeq.sorted

      val m0 = a1.join(b1, a1("fk") === b1("j"))
        .select($"k", $"fk", $"va", $"vb", lit(1L).as("w"))
      val d1 = dA.join(b1, dA("fk") === b1("j"))
        .select($"k", $"fk", $"va", $"vb", $"w")
      val d2 = a1.join(dB.withColumnRenamed("w", "wb"), a1("fk") === dB("j"))
        .select($"k", $"fk", $"va", $"vb", $"wb".as("w"))
      val d3 = dA.withColumnRenamed("w", "wa")
        .join(dB.withColumnRenamed("w", "wb"), $"fk" === dB("j"))
        .select($"k", $"fk", $"va", $"vb", ($"wa" * $"wb").as("w"))
      val maintained = m0.unionByName(d1).unionByName(d2).unionByName(d3)
        .groupBy($"k", $"fk", $"va", $"vb").agg(sum($"w").as("m"))
        .filter($"m" > 0)
      // multiplicities must resolve to exactly 1 (keys are unique per side)
      assert(maintained.filter($"m" =!= 1L).count() == 0, s"trial $trial: multiplicity != 1")

      val recomputed = a2.join(b2, a2("fk") === b2("j"))
        .select($"k", $"fk", $"va", $"vb")
      assert(rows(maintained) == rows(recomputed), s"trial $trial")
    }
  }
}
