package graft

import graft.functions.CountMatches
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The `spark.sql.extensions=graft.GraftExtensions` install path — the
  * zero-code deployment story (spark-submit conf / SQL-only clients) — and
  * the [[RegexCountRewrite]] optimizer rule it injects.
  */
class ExtensionsSpec extends SparkSpec {

  /** Build a brand-new SparkSession (sharing the fixture's SparkContext)
    * whose ONLY graft hookup is the conf-string extensions line, run `f`,
    * then restore the fixture session. */
  private def withExtensionsSession[A](extraConf: Map[String, String] = Map.empty)(
      f: SparkSession => A): A = {
    val orig = spark // force fixture init so a context exists
    // spark.sql.extensions is STATIC: getOrCreate instantiates the classes
    // named on the SparkContext conf (builder options can't set it once the
    // context exists), so plant it there — exactly what `--conf
    // spark.sql.extensions=graft.GraftExtensions` does on spark-submit.
    val conf = org.apache.spark.graft.TestShims.liveConf(orig.sparkContext)
    val prev = conf.getOption("spark.sql.extensions")
    conf.set("spark.sql.extensions", "graft.GraftExtensions")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val b = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", 8)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      extraConf.foreach { case (k, v) => b.config(k, v) }
      f(b.getOrCreate())
    } finally {
      prev match {
        case Some(v) => conf.set("spark.sql.extensions", v)
        case None    => conf.remove("spark.sql.extensions")
      }
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("conf-string install exposes the SQL functions without registerAll") {
    withExtensionsSession() { s2 =>
      import s2.implicits._
      Seq("the quick brown fox").toDF("text").createOrReplaceTempView("ext_docs")
      // these calls resolve through the injected registry (no registerAll here)
      val r = s2.sql(
        """SELECT rolling_hash(text) AS rh,
                  simhash64(word_shingles(text)) AS sh,
                  count_matches(text, '[a-z]+') AS n
           FROM ext_docs""").head()
      assert(r.getLong(0) != 0L)
      assert(r.getInt(2) == 4)
      // injected = session-scoped built-in, visible in the registry
      assert(s2.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_bands")))
      // r15 kernels resolve from pure SQL too: the spec bucket hash and the
      // real codec pair (PNG round trip through SQL alone)
      val r15 = s2.sql(
        """SELECT iceberg_bucket(34L, 16) AS b,
                  iceberg_bucket('iceberg', 16) AS bs,
                  image_decode(png_encode(array(7, 8, 9, 10), 2, 2)).gray AS g,
                  wav_decode(wav_encode(array(100, -100, 50), 8000)).samples AS s
           FROM (SELECT 1)""").head()
      assert(r15.getInt(0) == 2017239379 % 16)
      assert(r15.getInt(1) == 1210000089 % 16)
      assert(r15.getSeq[Int](2) == Seq(7, 8, 9, 10))
      assert(r15.getSeq[Int](3) == Seq(100, -100, 50))
    }
  }

  test("RegexCountRewrite rewrites size(regexp_extract_all(_, pat, 0)) and preserves results") {
    withExtensionsSession() { s2 =>
      // parquet-backed source: a LocalRelation would be constant-folded
      // before the plan assertion could see the rewrite
      def tokenCounts(s: SparkSession) = s.read.parquet(sf("sf0.001") + "/documents.parquet")
        .select(col("doc_id"), size(graft.functions.ascii_tokens(col("text"))).as("n"))
      val df = tokenCounts(s2)
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(_.isInstanceOf[CountMatches])),
        s"rule did not fire:\n$optimized")
      // parity with the unrewritten fixture session (no extensions there)
      val plainDf = tokenCounts(spark)
      assert(!plainDf.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[CountMatches])))
      val viaRule = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(viaRule == plainDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
      // null propagates like size(regexp_extract_all(NULL)) under the default conf
      val nullRow = s2.sql("SELECT size(regexp_extract_all(CAST(NULL AS STRING), '[a-z]+', 0)) AS n").head()
      assert(nullRow.isNullAt(0))
    }
  }

  test("rule leaves the legacy sizeOfNull form alone (size(NULL) must stay -1)") {
    // ANSI mode (Spark 4 default) forces legacySizeOfNull=false, so turn
    // both knobs to reach the legacy form the guard protects.
    withExtensionsSession(Map(
      "spark.sql.legacy.sizeOfNull" -> "true",
      "spark.sql.ansi.enabled" -> "false")) { s2 =>
      val df = s2.sql("SELECT size(regexp_extract_all(CAST(NULL AS STRING), '[a-z]+', 0)) AS n")
      assert(!df.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[CountMatches])),
        "rewrite must not fire when Size carries legacySizeOfNull=true")
      assert(df.head().getInt(0) == -1)
    }
  }

  test("rule does not touch non-zero group indices or non-literal patterns") {
    withExtensionsSession() { s2 =>
      // group idx 1: RegExpExtractAll validates the group count; a count
      // rewrite would swallow that error
      val grouped = s2.sql("SELECT size(regexp_extract_all('ab ab', '(a)(b)', 1)) AS n")
      assert(!grouped.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[CountMatches])))
      assert(grouped.head().getInt(0) == 2)
      // out-of-range group index still errors with the rule installed
      intercept[Exception] {
        s2.sql("SELECT size(regexp_extract_all('ab', '(a)', 7)) AS n").collect()
      }
      // non-literal pattern column: no rewrite (pattern compiles per row)
      import s2.implicits._
      val dyn = Seq(("aaa", "a"), ("bbb", "b")).toDF("s", "p")
        .selectExpr("size(regexp_extract_all(s, p, 0)) AS n")
      assert(!dyn.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[CountMatches])))
      assert(dyn.collect().map(_.getInt(0)).toSeq == Seq(3, 3))
    }
  }

  test("count_matches matches size(regexp_extract_all) across adversarial inputs") {
    withExtensionsSession() { s2 =>
      import s2.implicits._
      val inputs = Seq("", " ", "abc", "a b c", "ABC", "a1!b2?c3", "ü ö ä",
        "x" * 2000, ("word " * 500).trim, "\n\t mixed \r CASE tokens 42")
      val pat = java.util.regex.Pattern.compile("[a-z]+")
      def truth(s: String): Int = {
        val m = pat.matcher(s.toLowerCase); var n = 0; while (m.find()) n += 1; n
      }
      val df = inputs.toDF("text").select(
        col("text"),
        expr("count_matches(lower(text), '[a-z]+')").as("fast"),
        size(graft.functions.ascii_tokens(col("text"))).as("rewritten"))
      df.collect().foreach { r =>
        val want = truth(r.getString(0))
        assert(r.getInt(1) == want && r.getInt(2) == want,
          s"mismatch on '${r.getString(0).take(30)}': want $want, " +
            s"fast=${r.getInt(1)}, rewritten=${r.getInt(2)}")
      }
    }
  }

  test("GRAFT DEDUP statement plans the MinHash near-dup pipeline from pure SQL") {
    withExtensionsSession() { s2 =>
      core.table(s2, sf("sf0.001"), "documents")
        .select(col("doc_id"), col("text"))
        .createOrReplaceTempView("parser_docs")
      val viaSql = s2.sql("GRAFT DEDUP parser_docs THRESHOLD 0.8")
        .collect().map(_.toSeq).toSet
      val viaApi = graft.operators.NearDup
        .minhashLshPairs(s2.table("parser_docs"), 0.8)
        .collect().map(_.toSeq).toSet
      assert(viaSql == viaApi && viaSql.nonEmpty,
        s"sql=${viaSql.size} api=${viaApi.size}")
      // the dialect is additive: ordinary SQL still parses through the
      // delegate, and a malformed GRAFT statement errors instead of
      // silently delegating
      assert(s2.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
      intercept[Exception] { s2.sql("GRAFT DEDUP THRESHOLD 0.8").collect() }
    }
  }
}
