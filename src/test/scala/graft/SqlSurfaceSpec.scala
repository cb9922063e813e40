package graft

import org.apache.spark.sql.DataFrame

/** VERDICT r5 item 8: the engine surfaced end-to-end through SQL. Each test
  * runs a representative §2.2/§2.3 query PURELY as a SQL string through
  * `spark.sql` in a kernel-registered session (no DataFrame API on the query
  * path) and asserts row-for-row equality with the registered
  * `SparkEntry.queries` implementation — proving a SQL-only client (Thrift
  * server, notebook) can run the relational + training-data core unchanged.
  *
  * Custom kernels exercised from SQL on the way: `word_shingles`,
  * `minhash_bands` (scalar, codegen'd) and `topk_pairs` (bounded-state
  * aggregate — the analyzer wraps the registry-built AggregateFunction, so
  * partial aggregation works from SQL exactly as from the column API).
  * Kernels NOT reachable from SQL by design: none — every sqlBuilders entry
  * is registered by both GraftExtensions and functions.registerAll; whole
  * OPERATORS with driver-side iteration (PageRank, Lloyd, BFS) are Scala
  * entry points, documented in SURVEY §3 as the library surface (their SQL
  * story is the oracle replay, not a SQL function).
  */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  private def view(name: String): Unit =
    core.table(spark, dir, name).createOrReplaceTempView(name)

  private lazy val ready: Unit = {
    functions.registerAll(spark)
    Seq("lineitem", "orders", "customer", "nation", "region", "documents")
      .foreach(view)
    core.eventsTable(spark, dir).createOrReplaceTempView("events")
  }

  private def engine(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  private def assertSame(name: String, sql: String): Unit = {
    ready
    val viaSql = spark.sql(sql)
    val viaApi = engine(name)
    assert(viaSql.columns.toSeq == viaApi.columns.toSeq,
      s"$name columns: ${viaSql.columns.toSeq} vs ${viaApi.columns.toSeq}")
    val a = viaSql.collect().map(_.toSeq).toSeq
    val b = viaApi.collect().map(_.toSeq).toSeq
    assert(a == b, s"$name: SQL result differs from the DataFrame API result")
    assert(a.nonEmpty, s"$name: empty result proves nothing")
  }

  private def moneyE(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"CAST(CAST(CAST($expr AS DECIMAL(18,$scale)) AS DECIMAL(38,$scale)) * $f AS BIGINT)"
  }
  private val revenue =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  test("q1_pricing_summary runs as pure SQL") {
    assertSame("q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        ${moneyE("SUM(CAST(l_quantity AS DECIMAL(18,4)))", 4)} AS sum_qty_e4,
        ${moneyE("SUM(CAST(l_extendedprice AS DECIMAL(18,4)))", 4)} AS sum_base_price_e4,
        ${moneyE(s"SUM($revenue)", 6)} AS sum_disc_price_e6,
        ${moneyE(s"SUM(CAST($revenue AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))))", 6)} AS sum_charge_e6,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")
  }

  test("q3_shipping_priority runs as pure SQL") {
    assertSame("q3_shipping_priority",
      s"""SELECT l_orderkey, unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS odate_us, o_orderpriority,
        ${moneyE(s"SUM($revenue)", 6)} AS revenue_e6
        FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-01-01'
          AND l_shipdate > TIMESTAMP '2000-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e6 DESC, l_orderkey LIMIT 10""")
  }

  test("q12_rollup runs as pure SQL") {
    assertSame("q12_rollup",
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
        ${moneyE("SUM(CAST(c_acctbal AS DECIMAL(18,2)))", 2)} AS sum_bal_e2
        FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name, n_name""")
  }

  test("grouped_topk runs as pure SQL through the topk_pairs aggregate kernel") {
    assertSame("grouped_topk",
      """SELECT event_type, e.v AS event_id, e.p AS value_e4
        FROM (SELECT event_type,
                topk_pairs(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT),
                           event_id, 5, true) AS tk
              FROM events GROUP BY event_type)
        LATERAL VIEW explode(tk) t AS e
        ORDER BY event_type, value_e4 DESC, event_id""")
  }

  test("dedup_exact runs as pure SQL") {
    assertSame("dedup_exact",
      """WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000, text FROM documents)
        SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
          count(*) AS n_copies
        FROM corpus GROUP BY text""")
  }

  test("dedup_minhash_lsh runs as pure SQL through the minhash kernels") {
    assertSame("dedup_minhash_lsh",
      """WITH sets AS (SELECT doc_id, word_shingles(text) AS s FROM documents),
        banded AS (
          SELECT doc_id, band, bucket FROM sets
          LATERAL VIEW posexplode(minhash_bands(s)) t AS band, bucket),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        scored AS (
          SELECT id_a, id_b,
            CAST(size(array_intersect(sa.s, sb.s)) AS BIGINT) AS n_common,
            CAST(size(sa.s) + size(sb.s) - size(array_intersect(sa.s, sb.s)) AS BIGINT) AS n_union
          FROM cand
            JOIN sets sa ON cand.id_a = sa.doc_id
            JOIN sets sb ON cand.id_b = sb.doc_id)
        SELECT id_a, id_b, n_common, n_union,
          CAST(n_common AS DOUBLE) / n_union AS jaccard
        FROM scored
        WHERE CAST(n_common AS DOUBLE) / n_union >= 0.5
        ORDER BY id_a, id_b""")
  }

  test("anomaly_zscore runs as pure SQL (DECIMAL(38,0) products, div)") {
    assertSame("anomaly_zscore",
      """WITH v AS (SELECT event_id, event_type,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_c
          FROM events),
        st AS (SELECT event_type, count(*) AS n, sum(value_c) AS s,
            sum(value_c * value_c) AS ss FROM v GROUP BY event_type),
        z AS (SELECT event_id, v.event_type, value_c,
            (1000000L * CAST(st.n * value_c - st.s AS DECIMAL(38,0))
                      * CAST(st.n * value_c - st.s AS DECIMAL(38,0)))
            div greatest(CAST(st.n AS DECIMAL(38,0)) * st.ss
                         - CAST(st.s AS DECIMAL(38,0)) * st.s,
                         CAST(1 AS DECIMAL(38,0))) AS z2_e6
          FROM v JOIN st ON v.event_type = st.event_type)
        SELECT event_id, event_type, value_c, z2_e6 FROM z
        WHERE z2_e6 > 9000000 ORDER BY event_id""")
  }

  test("source_mix_hhi runs as pure SQL") {
    assertSame("source_mix_hhi",
      """WITH sc AS (SELECT lang, source, count(*) AS c
            FROM documents GROUP BY lang, source),
          g AS (SELECT lang, sum(c) AS n_docs, count(*) AS n_sources,
              max(c) AS max_c, sum(c * c) AS sum_c2 FROM sc GROUP BY lang)
        SELECT lang, n_docs, n_sources,
          (1000000L * max_c) div n_docs AS top_share_e6,
          (CAST(1000000000000L AS DECIMAL(38,0)) * CAST(sum_c2 AS DECIMAL(38,0)))
            div (CAST(n_docs AS DECIMAL(38,0)) * CAST(n_docs AS DECIMAL(38,0))) AS hhi_e12
        FROM g ORDER BY lang""")
  }

  test("benford_digit_audit runs as pure SQL") {
    assertSame("benford_digit_audit",
      """WITH b AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS digit
            FROM orders),
          g AS (SELECT digit, count(*) AS n FROM b GROUP BY digit),
          t AS (SELECT sum(n) AS total FROM g),
          x AS (SELECT digit, n, (1000000L * n) div t.total AS obs_share_e6,
              CASE digit
                WHEN 1 THEN 301029L WHEN 2 THEN 176091L WHEN 3 THEN 124938L
                WHEN 4 THEN 96910L  WHEN 5 THEN 79181L  WHEN 6 THEN 66946L
                WHEN 7 THEN 57991L  WHEN 8 THEN 51152L  ELSE 45757L END AS exp_share_e6
            FROM g, t)
        SELECT digit, n, obs_share_e6, exp_share_e6,
          abs(obs_share_e6 - exp_share_e6) AS dev_e6
        FROM x ORDER BY digit""")
  }

  test("cep_pattern_match runs as pure SQL") {
    assertSame("cep_pattern_match",
      """WITH ev AS (SELECT user_id, event_id, unix_micros(ts) AS us, event_type
            FROM events WHERE event_type IN ('view', 'click', 'purchase')),
          m AS (SELECT user_id, us, event_type,
              lead(event_type, 1) OVER w AS t1,
              lead(event_type, 2) OVER w AS t2,
              lead(us, 2) OVER w AS u2
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT user_id, count(*) AS n_matches, min(us) AS first_match_us
        FROM m
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND u2 - us <= 86400000000L
        GROUP BY user_id ORDER BY user_id""")
  }

  test("vwap_bars runs as pure SQL") {
    assertSame("vwap_bars",
      """SELECT unix_micros(date_trunc('month', l_shipdate)) AS mon_us, l_returnflag,
          sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
            div sum(CAST(l_quantity AS BIGINT)) AS vwap_c,
          sum(CAST(l_quantity AS BIGINT)) AS volume,
          count(*) AS n_lines
        FROM lineitem GROUP BY 1, 2 ORDER BY mon_us, l_returnflag""")
  }
}
