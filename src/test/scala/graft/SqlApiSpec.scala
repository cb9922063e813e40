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

  test("SQL functions honor literal parameters and reject wrong arity") {
    registerAll(spark)
    Seq("one two three four five").toDF("text").createOrReplaceTempView("sql_arity_docs")
    // word_shingles(text, 5): one 5-gram from 5 tokens (not the n=3 default's 3)
    val n5 = spark.sql("SELECT word_shingles(text, 5) AS sh FROM sql_arity_docs")
      .as[Seq[String]].head()
    assert(n5 == Seq("one two three four five"))
    val n3 = spark.sql("SELECT word_shingles(text) AS sh FROM sql_arity_docs")
      .as[Seq[String]].head()
    assert(n3.size == 3)
    // rolling_hash(text, base, mod) honors its parameters
    val rh = spark.sql("SELECT rolling_hash('abc', 7, 97) AS h").head().getLong(0)
    assert(rh == "abc".getBytes.foldLeft(0L)((h, b) => (h * 7 + b) % 97))
    // minhash_bands(sh, 128, 32) yields 32 bands
    assert(spark.sql("SELECT size(minhash_bands(word_shingles(text), 128, 32)) AS n FROM sql_arity_docs")
      .head().getInt(0) == 32)
    // sign_random_projection_poly (r9): reachable from SQL, equals the
    // column API, and its LCG buckets stay within the numBits range
    Seq((1L, Array(0.6f, -0.8f, 0.1f)), (2L, Array(-1.0f, 0.2f, 0.9f)))
      .toDF("id", "vec").createOrReplaceTempView("sql_poly_docs")
    val polySql = spark.sql(
      "SELECT sign_random_projection_poly(vec, 4, 1000) AS b FROM sql_poly_docs")
      .as[Int].collect().toSeq
    val polyCol = spark.table("sql_poly_docs")
      .select(sign_random_projection_poly($"vec", 4, 1000)).as[Int].collect().toSeq
    assert(polySql == polyCol && polySql.forall(b => b >= 0 && b < 16))
    // wrong arity fails loudly instead of silently ignoring arguments
    intercept[Exception](spark.sql("SELECT word_shingles(text, 5, 9) FROM sql_arity_docs").collect())
    intercept[Exception](spark.sql("SELECT simhash64(text, 2) FROM sql_arity_docs").collect())
    // non-literal parameter fails loudly (it parameterizes codegen constants)
    intercept[Exception](
      spark.sql("SELECT word_shingles(text, length(text)) FROM sql_arity_docs").collect())
  }

  test("GraftSession.install registers on an existing session") {
    GraftSession.install(spark)
    assert(spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0) ==
      "abc".getBytes.foldLeft(0L)((h, b) => (h * 31 + b) % 1000000007L))
  }
}
