package graft

import graft.functions._

/** The kernels must be reachable from plain SQL after registration — the
  * "switch from the reference" story includes SQL users. */
class SqlApiSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate like the column API") {
    registerAll(spark)
    Seq(("the quick brown fox", Array(0.6f, 0.8f)), ("jumps over", Array(1.0f, 0.0f)))
      .toDF("text", "vec").createOrReplaceTempView("sql_docs")
    val rows = spark.sql(
      """SELECT rolling_hash(text) AS rh,
                simhash64(word_shingles(text)) AS sh,
                size(minhash_bands(word_shingles(text))) AS nb,
                cosine_sim(vec, vec) AS self_cos
         FROM sql_docs""").collect()
    assert(rows.length == 2)
    val viaCols = spark.table("sql_docs").select(
      rolling_hash($"text"), simhash64(word_shingles($"text"))).collect()
    assert(rows.map(_.getLong(0)).toSeq == viaCols.map(_.getLong(0)).toSeq)
    assert(rows.map(_.getLong(1)).toSeq == viaCols.map(_.getLong(1)).toSeq)
    rows.foreach { r =>
      assert(r.getInt(2) == 16)
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    }
  }

  test("GraftSession.install registers on an existing session") {
    GraftSession.install(spark)
    assert(spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0) ==
      "abc".getBytes.foldLeft(0L)((h, b) => (h * 31 + b) % 1000000007L))
  }
}
