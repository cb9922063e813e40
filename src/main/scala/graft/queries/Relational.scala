package graft.queries

import graft.{core, Q}
import graft.core._
import graft.operators.AsOfJoin
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.2 relational / analytics core. Every query has a DuckDB oracle.
  *
  * Declarative DataFrame plans throughout: Catalyst pushes filters/projections
  * into the parquet scans, AQE picks join strategies at runtime; dimension
  * tables (region/nation/supplier/band tables) are explicitly broadcast.
  */
object Relational {

  private def revenue(s: SparkSession): org.apache.spark.sql.Column = {
    import s.implicits._
    dec4($"l_extendedprice") * (one4 - dec4($"l_discount"))
  }
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  // ---- Replayable-sketch twin machinery (r14, VERDICT r13 #2) -------------
  // The five remaining rows-only sketch rows (HLL ×2 here + KMV
  // intersection, GK quantiles, CMS frequent items) are promoted to FULL
  // oracles with the kmv_intersection_replayable playbook: swap the
  // unreplayable hash (xxhash64 / Spark's internal HLL++ / DataSketches)
  // for integer arithmetic over the Mersenne prime 2⁶¹−1 that BOTH engines
  // compute bit-for-bit, and keep every estimator an exact integer
  // rational. The native-sketch production paths stay as the
  // `*Native` companions below, error-bound-checked in ApproxSpec — the
  // REGISTERED rows are the standing oracles that trip on any drift in
  // register/merge/estimator logic.
  //
  // HLL twin: h = (x + C)¹⁷ mod M. A bare LCG has no avalanche — its
  // lattice structure skews the leading-zero statistic ρ so badly the raw
  // estimator read 67% high in a prototype — while x↦x¹⁷ mod M is a true
  // PERMUTATION of the field (gcd(17, M−1) = 1; 17 is the smallest odd
  // exponent coprime to M−1 = 2·(2⁶⁰−1), every prime < 17 divides 2⁶⁰−1)
  // with multiplicative mixing across all 61 bits: measured ≤ 7.2% error
  // at n ∈ {15 … 600k} against m=256's theoretical σ ≈ 6.5%. Five modmuls
  // (x²,x⁴,x⁸,x¹⁶,·x), each a DECIMAL(38,0)/HUGEINT product < 2¹²² kept
  // exact in both engines.
  private val SkMod = 2305843009213693951L // M = 2^61 − 1 (Mersenne prime)
  private val SkA = 6364136223846793005L   // LCG multiplier (sampling/CMS rows)
  private val SkC = 1442695040888963407L   // additive pre-mix constant
  // Raw HLL estimator as ONE exact rational: α_m·m²/Σ2^(−Mj) with
  // α_m = 7213m/(10000m+10790) exactly, so est = NUM DIV (DEN·S) where
  // S = Σ_j 2^(54−Mj) (empty registers contribute 2^54) — NUM = 7213·m³·2^54.
  private val HllNum = "2179995484220080059288911872"
  private val HllDen = 2570790L            // 10000·256 + 10790
  private val HllEmpty = 18014398509481984L // 2^54, an empty register's S term
  /** Linear-counting table for the small-range correction (Flajolet et al.:
    * raw ≤ 5/2·m and V empty registers > 0 → m·ln(m/V)): V ∈ [1, 256] →
    * round(256·ln(256/V)), inlined VERBATIM into both engines (the pHash
    * DCT-basis discipline — one Scala array is the single source for the
    * Column literal AND the interpolated SQL list, zero cross-engine libm). */
  private val HllLc: IndexedSeq[Long] =
    (1 to 256).map(v => math.round(256.0 * math.log(256.0 / v)))
  private val d38 = DecimalType(38, 0)

  // CMS twin: 4 pairwise-independent Carter–Wegman rows h_i(x) =
  // ((a_i·x + b_i) mod M) mod 8192 over the proven-replayable polynomial
  // rolling hash x of the token (the rolling_fingerprint row's hash — one
  // Horner fold mod 1e9+7 both engines compute identically). Fixed
  // arbitrary odd constants < M, inlined into both engines.
  private val CmsA = Seq(1181783497276652981L, 2046029254386353087L,
    1442695040888963407L, 768777513237032717L)
  private val CmsB = Seq(579710487132797444L, 1234567890123456789L,
    987654321987654321L, 192837465564738291L)
  private val CmsW = 8192L

  /** CMS row-i bucket of a rolling-hash value. */
  private def cmsBucket(x: Column, i: Int): Column =
    pmod(pmod(x.cast(d38) * lit(CmsA(i)).cast(d38) + lit(CmsB(i)).cast(d38),
      lit(SkMod).cast(d38)).cast(LongType), lit(CmsW))

  /** DuckDB mirror of `graft.functions.rolling_hash` (base 31, mod 1e9+7 —
    * the rolling_fingerprint oracle's exact Horner fold). */
  private def rollingHashSql(c: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"generate_series(1, length($c)), i -> ord(substr($c, i::INT, 1))::BIGINT))," +
      s" (acc, ch) -> (acc * 31 + ch) % 1000000007)"

  /** x ↦ (x + C)^17 mod M as a Column — the replayable HLL hash. */
  private def h17(key: Column): Column = {
    val m = lit(SkMod).cast(d38)
    def mm(a: Column, b: Column) = pmod(a * b, m)
    val x0 = pmod(key.cast(d38) + lit(SkC).cast(d38), m)
    val x2 = mm(x0, x0); val x4 = mm(x2, x2)
    val x8 = mm(x4, x4); val x16 = mm(x8, x8)
    mm(x16, x0).cast(LongType)
  }

  /** HLL register frame for `key` under optional group columns:
    * (grp…, j ∈ [0,256), mj = max ρ) — ρ = leading-zero rank of the 53
    * hash bits above the register index, via length(bin(w)) (both engines
    * print minimal binary). Map-side partial max ⇒ bounded shuffle: this IS
    * the mergeable-sketch shape, ≤ 256 registers per group leave each task. */
  private def hllRegs(df: DataFrame, grp: Seq[String], key: Column): DataFrame = {
    val withH = df.select(grp.map(col) :+ h17(key).as("h"): _*)
    val w = idiv(col("h"), lit(256L))
    withH.select(grp.map(col) ++ Seq(
        pmod(col("h"), lit(256L)).as("j"),
        when(w === lit(0L), lit(54))
          .otherwise(lit(54) - length(bin(w))).as("rho")): _*)
      .groupBy((grp :+ "j").map(col): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Distinct-count estimate per group from an HLL register frame: the raw
    * rational estimator with the linear-counting small-range switch. */
  private def hllEst(regs: DataFrame, grp: Seq[String], outName: String): DataFrame = {
    val pw = expr("shiftleft(cast(1 as bigint), cast(54 - mj as int))").cast(d38)
    val base = if (grp.isEmpty) regs.groupBy() else regs.groupBy(grp.map(col): _*)
    val agg = base.agg(
      (sum(pw) + (lit(256L) - count(lit(1))).cast(d38) *
        lit(HllEmpty).cast(d38)).as("s"),
      (lit(256L) - count(lit(1))).as("v"))
    val raw = idiv(lit(HllNum).cast(d38), lit(HllDen).cast(d38) * col("s"))
    val lcArr = array(HllLc.map(lit(_)): _*)
    agg.select(grp.map(col) :+
      when(col("v") > lit(0L) && raw <= lit(640L),
        element_at(lcArr, col("v").cast(IntegerType))).otherwise(raw)
        .as(outName): _*)
  }

  /** DuckDB CTE chain mirroring [[hllRegs]]+[[hllEst]] for one key: emits
    * CTEs `<p>b1..<p>s` and `<p>e(t?, est)`. `grouped` carries event_type. */
  private def hllSql(key: String, p: String, grouped: Boolean,
      withAllUnion: Boolean = false): String = {
    val g = if (grouped) "t, " else ""
    val gb = if (grouped) "GROUP BY 1, 2" else "GROUP BY 1"
    val tsel = if (grouped) "event_type AS t, " else ""
    val lc = HllLc.mkString("[", ",", "]")
    val regs = if (withAllUnion)
      s"""${p}r0 AS (SELECT $g h % 256 AS j, MAX(CASE WHEN h // 256 = 0 THEN 54
            ELSE 54 - length(bin(h // 256)) END) AS mj FROM ${p}h $gb),
        ${p}r AS (SELECT 'ALL' AS t, j, MAX(mj) AS mj FROM ${p}r0 GROUP BY 2
          UNION ALL SELECT t, j, mj FROM ${p}r0)"""
    else
      s"""${p}r AS (SELECT $g h % 256 AS j, MAX(CASE WHEN h // 256 = 0 THEN 54
            ELSE 54 - length(bin(h // 256)) END) AS mj FROM ${p}h $gb)"""
    val g2 = if (grouped || withAllUnion) "t, " else ""
    val gs2 = if (grouped || withAllUnion) "GROUP BY 1" else ""
    s"""${p}b1 AS (SELECT $tsel(CAST($key AS HUGEINT) + $SkC) % $SkMod AS x0 FROM events),
      ${p}b2 AS (SELECT $g2 x0, (x0*x0) % $SkMod AS x2 FROM ${p}b1),
      ${p}b3 AS (SELECT $g2 x0, (x2*x2) % $SkMod AS x4 FROM ${p}b2),
      ${p}b4 AS (SELECT $g2 x0, (x4*x4) % $SkMod AS x8 FROM ${p}b3),
      ${p}b5 AS (SELECT $g2 x0, (x8*x8) % $SkMod AS x16 FROM ${p}b4),
      ${p}h AS (SELECT $g2 CAST((x16*x0) % $SkMod AS BIGINT) AS h FROM ${p}b5),
      $regs,
      ${p}s AS (SELECT $g2 SUM(CAST(1::BIGINT << CAST(54 - mj AS INT) AS HUGEINT))
          + (256 - COUNT(*)) * CAST($HllEmpty AS HUGEINT) AS s,
          256 - COUNT(*) AS v FROM ${p}r $gs2),
      ${p}e AS (SELECT $g2 CASE WHEN v > 0 AND raw <= 640
          THEN list_extract($lc, CAST(v AS INT)) ELSE raw END AS est
        FROM (SELECT $g2 v, CAST(CAST('$HllNum' AS HUGEINT)
          // ($HllDen * s) AS BIGINT) AS raw FROM ${p}s))"""
  }

  // ---- Native-sketch production paths (ApproxSpec-checked) ----------------
  // The pre-r14 registered implementations, kept as first-class code: at
  // 100 TB these are what a production pipeline runs (codegen'd HLL++ /
  // DataSketches HLL / Spark CountMinSketch / GK approx_percentile); the
  // registered rows above/below are their REPLAYABLE twins whose oracle
  // trips on algorithmic drift. ApproxSpec holds both to error bounds
  // against exact answers.

  /** Spark HLL++ (`approx_count_distinct`) over users and events. */
  private[graft] def approxDistinctNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eventsTable(s, d)
      .agg(approx_count_distinct($"user_id").as("approx_users"),
        approx_count_distinct($"event_id").as("approx_events"))
  }

  /** DataSketches HLL per group + one sketch-union "ALL" row. */
  private[graft] def approxDistinctByGroupNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perType = eventsTable(s, d)
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    perType
      .select($"event_type", hll_sketch_estimate($"sk").as("approx_users"))
      .unionByName(perType
        .agg(hll_union_agg($"sk").as("sk"))
        .select(lit("ALL").as("event_type"),
          hll_sketch_estimate($"sk").as("approx_users")))
      .orderBy($"event_type")
  }

  /** Spark CountMinSketch (mergeable binary sketch) probed with the exact
    * top-50 tokens — O(sketch) bytes reduced, O(50) driver probes. */
  private[graft] def freqTokensTopkNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tokens = table(s, d, "documents")
      .select(explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))).as("token"))
    val sketchBytes = tokens
      .agg(expr("count_min_sketch(token, 0.0001d, 0.99d, 42)").as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val top = tokens.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(50)
      .as[(String, Long)].collect()
    s.createDataFrame(top.toSeq.map { case (t, c) => (t, c, cms.estimateCount(t)) })
      .toDF("token", "exact_cnt", "est_cnt")
      .orderBy($"exact_cnt".desc, $"token")
  }

  /** GK rank sketch (`approx_percentile`, accuracy 1000) per event type. */
  private[graft] def eventQuantilesGkNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    eventsTable(s, d)
      .groupBy($"event_type")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"),
        expr("approx_percentile(value, 0.95, 1000)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Bottom-k sketches on seedless-stable xxhash64 + the double-math KMV
    * estimators — the full-range-hash production path (KmvSpec-bounded). */
  private[graft] def approxDistinctIntersectionNative(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val K = 64
    val sk = eventsTable(s, d)
      .select($"event_type", xxhash64($"user_id").as("h")).distinct()
      .groupBy($"event_type")
      .agg(graft.functions.topk_pairs($"h", $"h", K).as("tk"))
    val sketches = sk.collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toArray.sorted)
      .sortBy(_._1)
    val rows = for {
      (ta, a) <- sketches.toSeq
      (tb, b) <- sketches.toSeq if ta < tb
    } yield {
      val u = graft.operators.Kmv.union(a, b, K)
      val (_, inter) = graft.operators.Kmv.intersection(a, b, K)
      (ta, tb,
        math.round(graft.operators.Kmv.estimate(a, K)),
        math.round(graft.operators.Kmv.estimate(b, K)),
        math.round(graft.operators.Kmv.estimate(u, K)),
        math.round(inter))
    }
    rows.toDF("type_a", "type_b", "est_a", "est_b", "est_union", "est_inter")
      .orderBy($"type_a", $"type_b")
  }

  val defs: Seq[(String, Q)] = Seq(
    "q1_pricing_summary" -> Q(
      (s, d) => {
        import s.implicits._
        table(s, d, "lineitem")
          .filter($"l_shipdate" <= ts("1998-09-01"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            moneyE(sum(dec4($"l_quantity")), 4).as("sum_qty_e4"),
            moneyE(sum(dec4($"l_extendedprice")), 4).as("sum_base_price_e4"),
            moneyE(sum(revenue(s)), 6).as("sum_disc_price_e6"),
            moneyE(sum(revenue(s).cast(D18_6) * (one4 + dec4($"l_tax"))), 6).as("sum_charge_e6"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${moneyESql("SUM(CAST(l_quantity AS DECIMAL(18,4)))", 4)} AS sum_qty_e4,
        ${moneyESql("SUM(CAST(l_extendedprice AS DECIMAL(18,4)))", 4)} AS sum_base_price_e4,
        ${moneyESql(s"SUM($revenueSql)", 6)} AS sum_disc_price_e6,
        ${moneyESql(s"SUM(CAST($revenueSql AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))))", 6)} AS sum_charge_e6,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      "TPC-H Q1-style filtered aggregation; decimal-exact sums"),

    "q3_shipping_priority" -> Q(
      (s, d) => {
        import s.implicits._
        val c = table(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = table(s, d, "orders").filter($"o_orderdate" < ts("2000-01-01"))
        val l = table(s, d, "lineitem").filter($"l_shipdate" > ts("2000-01-01"))
        broadcast(c)
          .join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(moneyE(sum(revenue(s)), 6).as("revenue_e6"))
          .select($"l_orderkey", micros($"o_orderdate").as("odate_us"),
            $"o_orderpriority", $"revenue_e6")
          .orderBy($"revenue_e6".desc, $"l_orderkey")
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
        ${moneyESql(s"SUM($revenueSql)", 6)} AS revenue_e6
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '2000-01-01' AND l_shipdate > TIMESTAMP '2000-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e6 DESC, l_orderkey LIMIT 10"""),
      "3-way join + group + deterministic top-10"),

    "q5_local_supplier" -> Q(
      (s, d) => {
        import s.implicits._
        val r = table(s, d, "region").filter($"r_name" === "ASIA")
        val n = table(s, d, "nation")
        val c = table(s, d, "customer")
        val o = table(s, d, "orders")
          .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1999-01-01"))
        val l = table(s, d, "lineitem")
        val su = table(s, d, "supplier")
        broadcast(broadcast(r).join(n, $"r_regionkey" === $"n_regionkey"))
          .join(c, $"n_nationkey" === $"c_nationkey")
          .join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .join(broadcast(su), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .groupBy($"n_name")
          .agg(moneyE(sum(revenue(s)), 6).as("revenue_e6"), count(lit(1)).as("n_items"))
          .orderBy($"revenue_e6".desc, $"n_name")
      },
      Some(s"""SELECT n_name, ${moneyESql(s"SUM($revenueSql)", 6)} AS revenue_e6,
        COUNT(*) AS n_items
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey AND n_nationkey = c_nationkey
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n_name ORDER BY revenue_e6 DESC, n_name"""),
      "6-way star join, dims broadcast"),

    "q6_forecast_revenue" -> Q(
      (s, d) => {
        import s.implicits._
        table(s, d, "lineitem")
          .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(moneyE(sum(dec4($"l_extendedprice") * dec4($"l_discount")), 6).as("revenue_e6"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT ${moneyESql("SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)))", 6)} AS revenue_e6,
        COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""),
      "selective filter aggregation; predicates pushed to parquet"),

    "q7_window_rank" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        table(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast(LongType))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      "top-3 orders per customer via window rank"),

    "q8_running_sum" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "lineitem")
          .filter($"l_suppkey" < 10)
          .withColumn("running_qty_e4", moneyE(sum(dec4($"l_quantity")).over(w), 4))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            micros($"l_shipdate").as("ship_us"), $"running_qty_e4")
          .orderBy($"l_suppkey", $"ship_us", $"l_orderkey", $"l_linenumber")
      },
      Some(s"""SELECT l_suppkey, l_orderkey, l_linenumber, epoch_us(l_shipdate) AS ship_us,
        ${moneyESql("""SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
          PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""", 4)} AS running_qty_e4
        FROM lineitem WHERE l_suppkey < 10
        ORDER BY l_suppkey, ship_us, l_orderkey, l_linenumber"""),
      "running sum, rows frame, total deterministic order"),

    "q9_distinct_agg" -> Q(
      (s, d) => {
        import s.implicits._
        table(s, d, "orders")
          .groupBy($"o_orderpriority")
          .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n_orders"),
            moneyE(sum(dec2($"o_totalprice")), 2).as("sum_price_e2"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders,
        ${moneyESql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS sum_price_e2
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "multi-distinct aggregation"),

    "q10_semi_join" -> Q(
      (s, d) => {
        import s.implicits._
        val big = table(s, d, "orders").filter($"o_totalprice" > 400000)
        table(s, d, "customer")
          .join(big, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", $"c_acctbal")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey"""),
      "EXISTS as left-semi join"),

    "q11_anti_join" -> Q(
      (s, d) => {
        import s.implicits._
        val big = table(s, d, "orders").filter($"o_totalprice" > 300000)
        table(s, d, "customer")
          .join(big, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey"""),
      "NOT EXISTS as left-anti join"),

    "q12_rollup" -> Q(
      (s, d) => {
        import s.implicits._
        val r = table(s, d, "region")
        val n = table(s, d, "nation")
        table(s, d, "customer")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n_cust"), moneyE(sum(dec2($"c_acctbal")), 2).as("sum_bal_e2"))
          .orderBy($"r_name", $"n_name")
      },
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
        ${moneyESql("SUM(CAST(c_acctbal AS DECIMAL(18,2)))", 2)} AS sum_bal_e2
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name, n_name"""),
      "ROLLUP grouping sets"),

    "q13_case_agg" -> Q(
      (s, d) => {
        import s.implicits._
        table(s, d, "customer")
          .join(broadcast(table(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            sum(when($"c_acctbal" > 5000, 1L).otherwise(0L)).as("n_rich"),
            sum(when($"c_acctbal" < 0, 1L).otherwise(0L)).as("n_neg"),
            count(lit(1)).as("n_cust"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name,
        CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
        CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        COUNT(*) AS n_cust
        FROM customer, nation WHERE c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),
      "conditional aggregation"),

    "q13_custdist" -> Q(
      (s, d) => {
        import s.implicits._
        // TPC-H Q13 shape: the customer-order-count DISTRIBUTION, including
        // the zero-order customers only a LEFT OUTER join can see (the
        // histogram-of-a-groupBy double aggregate). The predicate stands in
        // for Q13's o_comment filter (this corpus has no comment column).
        // Scale shape: one shuffle on custkey for the outer join + count
        // (partial aggregation map-side), then the second aggregate runs on
        // O(distinct counts) rows — essentially free.
        val c = table(s, d, "customer").select($"c_custkey")
        val o = table(s, d, "orders")
          .filter($"o_orderpriority" =!= "1-URGENT")
          .select($"o_custkey", $"o_orderkey")
        c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
      "TPC-H Q13 shape (customer order-count distribution incl. zero-order " +
        "customers): left-outer join + histogram-of-groupBy double aggregate."),

    "q14_union_agg" -> Q(
      (s, d) => {
        import s.implicits._
        val c = table(s, d, "customer").select(lit("customer").as("kind"), $"c_acctbal".as("bal"))
        val su = table(s, d, "supplier").select(lit("supplier").as("kind"), $"s_acctbal".as("bal"))
        c.unionAll(su)
          .groupBy($"kind")
          .agg(count(lit(1)).as("n"), moneyE(sum(dec2($"bal")), 2).as("sum_bal_e2"),
            min($"bal").as("min_bal"), max($"bal").as("max_bal"))
          .orderBy($"kind")
      },
      Some(s"""SELECT kind, COUNT(*) AS n,
        ${moneyESql("SUM(CAST(bal AS DECIMAL(18,2)))", 2)} AS sum_bal_e2,
        MIN(bal) AS min_bal, MAX(bal) AS max_bal
        FROM (SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
              UNION ALL SELECT 'supplier' AS kind, s_acctbal AS bal FROM supplier) t
        GROUP BY kind ORDER BY kind"""),
      "UNION ALL + re-aggregate"),

    "q15_topk_orders" -> Q(
      (s, d) => {
        import s.implicits._
        table(s, d, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      "global top-K via TakeOrderedAndProject (no full sort)"),

    "q16_time_bucket" -> Q(
      (s, d) => {
        import s.implicits._
        eventsTable(s, d)
          .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
          .agg(count(lit(1)).as("n"), moneyE(sum(dec4($"value")), 4).as("sum_value_e4"))
          .select(micros($"bucket").as("bucket_us"), $"event_type", $"n", $"sum_value_e4")
          .orderBy($"bucket_us", $"event_type")
      },
      Some(s"""SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
        COUNT(*) AS n, ${moneyESql("SUM(CAST(value AS DECIMAL(18,4)))", 4)} AS sum_value_e4
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
      "hourly time-bucket rollup"),

    "q17_sessionize" -> Q(
      (s, d) => {
        import s.implicits._
        val base = eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("tsu"))
        val wOrd = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base
          .withColumn("prev", lag($"tsu", 1).over(wOrd))
          .withColumn("is_new",
            when($"prev".isNull || $"tsu" - $"prev" > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum($"is_new").over(wRun))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"), min($"tsu").as("start_us"), max($"tsu").as("end_us"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH base AS (
          SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
        flagged AS (
          SELECT user_id, event_id, tsu,
            CASE WHEN lag(tsu) OVER w IS NULL OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM base WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        sessions AS (
          SELECT user_id, tsu,
            CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MIN(tsu) AS start_us, MAX(tsu) AS end_us
        FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id"""),
      "gaps-and-islands sessionization, 30-min gap"),

    "q18_asof_join" -> Q(
      (s, d) => {
        import s.implicits._
        val left = eventsTable(s, d)
          .select($"event_id", $"user_id", micros($"ts").as("tsu"))
        val right = table(s, d, "orders")
          .groupBy($"o_custkey", $"o_orderdate")
          .agg(max($"o_totalprice").as("o_val"))
          .select($"o_custkey", micros($"o_orderdate").as("otsu"),
            micros($"o_orderdate").as("asof_ts_us"), $"o_val")
        AsOfJoin.leftAsOf(left, right, "user_id", "o_custkey", "tsu", "otsu",
            Seq("asof_ts_us", "o_val"))
          .select($"event_id", $"user_id", $"tsu", $"asof_ts_us", $"o_val")
          .orderBy($"event_id")
      },
      Some("""WITH r AS (
          SELECT o_custkey AS k, epoch_us(o_orderdate) AS otsu, MAX(o_totalprice) AS o_val
          FROM orders GROUP BY 1, 2),
        l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
        SELECT l.event_id, l.user_id, l.tsu, r.otsu AS asof_ts_us, r.o_val
        FROM l ASOF LEFT JOIN r ON l.user_id = r.k AND l.tsu >= r.otsu
        ORDER BY l.event_id"""),
      "as-of join: single-shuffle union+window plan (operators.AsOfJoin)"),

    "sessionize_capped" -> Q(
      (s, d) => {
        import s.implicits._
        // Sessionization with BOTH a 48-hour inactivity gap AND a
        // 50-event cap per session (the runaway-bot guard q17's pure
        // gap-split lacks). The cap composes windowed: gap sessions first
        // (cumsum of gap-break flags), then rn-within-session div 50 —
        // two window passes sharing ONE per-user sort.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
        val ev = eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("us"))
          .withColumn("brk",
            (coalesce($"us" - lag($"us", 1).over(w), lit(0L)) > 172800000000L).cast(LongType))
          .withColumn("gap_sess", sum($"brk").over(w))
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "gap_sess").orderBy("us", "event_id")
        ev.withColumn("sess",
            $"gap_sess" * 1000L + idiv(row_number().over(w2).cast(LongType) - 1L, lit(50L)))
          .groupBy($"user_id", $"sess")
          .agg(count(lit(1)).as("n_events"), min($"us").as("start_us"),
            max($"us").as("end_us"))
          .orderBy($"user_id", $"sess")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        b AS (SELECT user_id, event_id, us,
            CASE WHEN coalesce(us - lag(us) OVER w, 0) > 172800000000 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        g AS (SELECT user_id, event_id, us,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gap_sess
          FROM b),
        c AS (SELECT user_id, us, gap_sess,
            gap_sess * 1000 + (CAST(row_number() OVER (PARTITION BY user_id, gap_sess
              ORDER BY us, event_id) AS BIGINT) - 1) // 50 AS sess
          FROM g)
        SELECT user_id, sess, count(*) AS n_events, min(us) AS start_us,
          max(us) AS end_us
        FROM c GROUP BY 1, 2 ORDER BY user_id, sess"""),
      "Capped sessionization (48-hour gap AND 50-event cap): gap-cumsum " +
        "sessions then rn-div-cap sub-split, two windows over one per-user " +
        "sort — the runaway-session guard plain gap-split lacks."),

    "basket_size_histogram" -> Q(
      (s, d) => {
        import s.implicits._
        // Order-size profile: line-item count per order, folded to a
        // histogram of basket sizes with e6 shares — the distribution
        // behind every per-order fan-out bound (triangles, pair joins)
        // documented in §4. Two aggregates, second one O(distinct sizes).
        val sizes = table(s, d, "lineitem")
          .groupBy($"l_orderkey").agg(count(lit(1)).as("basket"))
        val hist = sizes.groupBy($"basket").agg(count(lit(1)).as("n_orders"))
        val tot = hist.agg(sum($"n_orders").as("t"))
        hist.crossJoin(broadcast(tot))
          .select($"basket", $"n_orders",
            idiv(lit(1000000L) * $"n_orders", $"t").as("share_e6"))
          .orderBy($"basket")
      },
      Some("""WITH s AS (SELECT l_orderkey, count(*) AS basket FROM lineitem GROUP BY 1),
        h AS (SELECT basket, count(*) AS n_orders FROM s GROUP BY 1),
        t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t FROM h)
        SELECT basket, n_orders, (1000000 * n_orders) // t.t AS share_e6
        FROM h, t ORDER BY basket"""),
      "Basket-size histogram: per-order line counts folded to an " +
        "O(distinct sizes) distribution with e6 shares — the fan-out " +
        "profile behind every per-order pair bound."),

    "cep_pattern_match" -> Q(
      (s, d) => {
        import s.implicits._
        // Flink-CEP `next` semantics as a batch window: STRICT contiguity
        // of view→click→purchase over each user's stream FILTERED to those
        // types (CEP's relevant-event projection), with a 1-day window
        // bound on the whole match. Unlike funnel_analysis (earliest
        // per-stage, one conversion per user) this counts EVERY match and
        // enforces adjacency — two lead() columns over one per-user sort,
        // no self-joins. Per-user history is the scale bound, as for any
        // sequence operator.
        val ev = eventsTable(s, d)
          .filter($"event_type".isin("view", "click", "purchase"))
          .select($"user_id", $"event_id", micros($"ts").as("us"), $"event_type")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
        ev.withColumn("t1", lead($"event_type", 1).over(w))
          .withColumn("u1", lead($"us", 1).over(w))
          .withColumn("t2", lead($"event_type", 2).over(w))
          .withColumn("u2", lead($"us", 2).over(w))
          .filter($"event_type" === "view" && $"t1" === "click" &&
            $"t2" === "purchase" && $"u2" - $"us" <= 86400000000L)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_matches"), min($"us").as("first_match_us"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
          FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        m AS (SELECT user_id, us, event_type,
            lead(event_type, 1) OVER w AS t1,
            lead(event_type, 2) OVER w AS t2,
            lead(us, 2) OVER w AS u2
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT user_id, count(*) AS n_matches, min(us) AS first_match_us
        FROM m
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND u2 - us <= 86400000000
        GROUP BY user_id ORDER BY user_id"""),
      "CEP strict-contiguity pattern match (view>click>purchase adjacent in " +
        "the filtered stream, 1-day bound): two lead() columns over one " +
        "per-user sort, every match counted — the Flink-CEP `next` shape."),

    "cep_followed_by" -> Q(
      (s, d) => {
        import s.implicits._
        // Flink-CEP `followedBy` (RELAXED contiguity — Flink's default):
        // view →followedBy click →followedBy purchase `within` 1 day.
        // Non-matching events between stages are ignored, and each partial
        // match takes the FIRST next-stage occurrence (followedBy, not
        // followedByAny): a view's click is the minimum click rank after
        // it, that click's purchase is the minimum purchase rank after it.
        // Shape: one per-user rank window + one following-min window pass
        // computing BOTH next-stage ranks, then two (user_id, rn)
        // co-partitioned self-equi-joins — no cross join, per-user history
        // is the scale bound exactly as in the strict variant.
        val ev = eventsTable(s, d)
          .filter($"event_type".isin("view", "click", "purchase"))
          .select($"user_id", $"event_id", micros($"ts").as("us"), $"event_type")
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
        val wFol = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("rn")
          .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val n = ev.withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("next_click_rn",
            min(when($"event_type" === "click", $"rn")).over(wFol))
          .withColumn("next_purchase_rn",
            min(when($"event_type" === "purchase", $"rn")).over(wFol))
        val v = n.filter($"event_type" === "view")
          .select($"user_id", $"us".as("view_us"), $"next_click_rn")
        val c = n.select($"user_id", $"rn".as("crn"),
          $"next_purchase_rn".as("prn"))
        val p = n.select($"user_id", $"rn".as("prn2"), $"us".as("purchase_us"))
        v.join(c, Seq("user_id")).filter($"next_click_rn" === $"crn")
          .join(p, Seq("user_id")).filter($"prn" === $"prn2")
          .filter($"purchase_us" - $"view_us" <= 86400000000L)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_matches"), min($"view_us").as("first_match_us"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
          FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS rn FROM ev),
        n AS (SELECT *,
            min(CASE WHEN event_type = 'click' THEN rn END) OVER f AS next_click_rn,
            min(CASE WHEN event_type = 'purchase' THEN rn END) OVER f AS next_purchase_rn
          FROM r WINDOW f AS (PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        m AS (SELECT v.user_id, v.us AS view_us, p.us AS purchase_us
          FROM n v
          JOIN n c ON v.user_id = c.user_id AND c.rn = v.next_click_rn
          JOIN n p ON c.user_id = p.user_id AND p.rn = c.next_purchase_rn
          WHERE v.event_type = 'view' AND p.us - v.us <= 86400000000)
        SELECT user_id, count(*) AS n_matches, min(view_us) AS first_match_us
        FROM m GROUP BY user_id ORDER BY user_id"""),
      "CEP relaxed contiguity (Flink-CEP followedBy, its default semantic): " +
        "view then first following click then first following purchase " +
        "within 1 day — following-min window ranks + co-partitioned " +
        "self-equi-joins, never a cross join."),

    "cep_followed_by_quantified" -> Q(
      (s, d) => {
        import s.implicits._
        // `followedBy` with a QUANTIFIER — click.times(2): view →fB
        // click →fB click →fB purchase within 1 day. Same following-min
        // machinery; the second click is the first click AFTER the first
        // click (every row already carries its own next_click_rn, so the
        // chain is one more (user_id, rn) equi-join, not new window work).
        val ev = eventsTable(s, d)
          .filter($"event_type".isin("view", "click", "purchase"))
          .select($"user_id", $"event_id", micros($"ts").as("us"), $"event_type")
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
        val wFol = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("rn")
          .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val n = ev.withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("next_click_rn",
            min(when($"event_type" === "click", $"rn")).over(wFol))
          .withColumn("next_purchase_rn",
            min(when($"event_type" === "purchase", $"rn")).over(wFol))
        val v = n.filter($"event_type" === "view")
          .select($"user_id", $"us".as("view_us"), $"next_click_rn".as("c1rn"))
        val c1 = n.select($"user_id", $"rn".as("c1rn2"),
          $"next_click_rn".as("c2rn"))
        val c2 = n.select($"user_id", $"rn".as("c2rn2"),
          $"next_purchase_rn".as("prn"))
        val p = n.select($"user_id", $"rn".as("prn2"), $"us".as("purchase_us"))
        v.join(c1, Seq("user_id")).filter($"c1rn" === $"c1rn2")
          .join(c2, Seq("user_id")).filter($"c2rn" === $"c2rn2")
          .join(p, Seq("user_id")).filter($"prn" === $"prn2")
          .filter($"purchase_us" - $"view_us" <= 86400000000L)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_matches"), min($"view_us").as("first_match_us"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
          FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS rn FROM ev),
        n AS (SELECT *,
            min(CASE WHEN event_type = 'click' THEN rn END) OVER f AS next_click_rn,
            min(CASE WHEN event_type = 'purchase' THEN rn END) OVER f AS next_purchase_rn
          FROM r WINDOW f AS (PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        m AS (SELECT v.user_id, v.us AS view_us, p.us AS purchase_us
          FROM n v
          JOIN n c1 ON v.user_id = c1.user_id AND c1.rn = v.next_click_rn
          JOIN n c2 ON c1.user_id = c2.user_id AND c2.rn = c1.next_click_rn
          JOIN n p ON c2.user_id = p.user_id AND p.rn = c2.next_purchase_rn
          WHERE v.event_type = 'view' AND p.us - v.us <= 86400000000)
        SELECT user_id, count(*) AS n_matches, min(view_us) AS first_match_us
        FROM m GROUP BY user_id ORDER BY user_id"""),
      "CEP followedBy with a times(2) quantifier: view, two successive " +
        "first-following clicks, first following purchase, 1-day within — " +
        "the quantifier is one extra co-partitioned equi-join."),

    "cep_one_or_more" -> Q(
      (s, d) => {
        import s.implicits._
        // `followedBy` with the KLEENE quantifier — Flink-CEP
        // click.oneOrMore (GREEDY): view →fB click+ →fB purchase within
        // 1 day, where the click group absorbs EVERY click between the
        // view and the closing purchase (greedy; the reluctant variant is
        // exactly cep_followed_by's single-click chain). Completes the CEP
        // quantifier ladder: next (strict), followedBy (relaxed),
        // times(2), oneOrMore. Same following-min machinery plus ONE
        // running click-count column — the group SIZE is a prefix-count
        // difference (pfx(purchase) − pfx(view)), not a per-match scan,
        // so the absorbed-group accounting costs no extra join.
        val ev = eventsTable(s, d)
          .filter($"event_type".isin("view", "click", "purchase"))
          .select($"user_id", $"event_id", micros($"ts").as("us"), $"event_type")
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
        val wFol = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("rn")
          .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val wCum = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("rn")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val n = ev.withColumn("rn", row_number().over(wOrd).cast("long"))
          .withColumn("next_click_rn",
            min(when($"event_type" === "click", $"rn")).over(wFol))
          .withColumn("next_purchase_rn",
            min(when($"event_type" === "purchase", $"rn")).over(wFol))
          .withColumn("cum_clicks",
            sum(when($"event_type" === "click", 1L).otherwise(0L)).over(wCum))
        val v = n.filter($"event_type" === "view")
          .select($"user_id", $"us".as("view_us"), $"cum_clicks".as("vpfx"),
            $"next_click_rn".as("c1rn"))
        val c1 = n.select($"user_id", $"rn".as("c1rn2"),
          $"next_purchase_rn".as("prn"))
        val p = n.select($"user_id", $"rn".as("prn2"), $"us".as("purchase_us"),
          $"cum_clicks".as("ppfx"))
        v.join(c1, Seq("user_id")).filter($"c1rn" === $"c1rn2")
          .join(p, Seq("user_id")).filter($"prn" === $"prn2")
          .filter($"purchase_us" - $"view_us" <= 86400000000L)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_matches"),
            sum($"ppfx" - $"vpfx").as("clicks_absorbed"),
            min($"view_us").as("first_match_us"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
          FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY us, event_id) AS rn FROM ev),
        n AS (SELECT *,
            min(CASE WHEN event_type = 'click' THEN rn END) OVER f AS next_click_rn,
            min(CASE WHEN event_type = 'purchase' THEN rn END) OVER f AS next_purchase_rn,
            sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER c AS cum_clicks
          FROM r
          WINDOW f AS (PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
          c AS (PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        m AS (SELECT v.user_id, v.us AS view_us,
            p.cum_clicks - v.cum_clicks AS n_clicks
          FROM n v
          JOIN n c1 ON v.user_id = c1.user_id AND c1.rn = v.next_click_rn
          JOIN n p ON c1.user_id = p.user_id AND p.rn = c1.next_purchase_rn
          WHERE v.event_type = 'view' AND p.us - v.us <= 86400000000)
        SELECT user_id, count(*) AS n_matches,
          CAST(sum(n_clicks) AS BIGINT) AS clicks_absorbed,
          min(view_us) AS first_match_us
        FROM m GROUP BY user_id ORDER BY user_id"""),
      "CEP oneOrMore (greedy Kleene quantifier): view, at least one click, " +
        "first purchase after the first click, 1-day within — the absorbed " +
        "click-group size is a prefix-count difference, no per-match scan."),

    "hof_array_suite" -> Q(
      (s, d) => {
        import s.implicits._
        // HIGHER-ORDER-FUNCTION parity suite — the lambda surface
        // (transform / filter / exists / forall / aggregate / sort) pinned
        // against DuckDB's list functions in ONE query: per sampled order,
        // the sorted quantity array and six HOF-derived readouts. These
        // primitives underpin half the repo's kernels (every zip_with
        // cosine, byte fold, shingle filter); this row keeps the surface
        // itself under the oracle, so an engine-upgrade semantic drift in
        // any lambda primitive hash-mismatches immediately.
        val qties = table(s, d, "lineitem")
          .select($"l_orderkey", round($"l_quantity").cast("long").as("q"))
          .groupBy($"l_orderkey")
          .agg(sort_array(collect_list($"q")).as("qs"))
          .filter($"l_orderkey" % 97 === 0)
        qties.select($"l_orderkey",
            size($"qs").cast("long").as("n_lines"),
            aggregate($"qs", lit(0L), (acc, x) => acc + x).as("total_qty"),
            size(filter($"qs", x => x > 25L)).cast("long").as("n_big"),
            when(exists($"qs", x => x >= 45L), 1L).otherwise(0L).as("has_jumbo"),
            when(forall($"qs", x => x > 0L), 1L).otherwise(0L).as("all_positive"),
            aggregate(transform($"qs", x => x * x), lit(0L), (acc, x) => acc + x)
              .as("sum_sq"),
            element_at($"qs", -1).as("max_q"))
          .orderBy($"l_orderkey")
      },
      Some("""WITH a AS (SELECT l_orderkey,
            list_sort(list(CAST(round(l_quantity) AS BIGINT))) AS qs
          FROM lineitem GROUP BY 1)
        SELECT l_orderkey,
          CAST(len(qs) AS BIGINT) AS n_lines,
          CAST(list_sum(qs) AS BIGINT) AS total_qty,
          CAST(len(list_filter(qs, x -> x > 25)) AS BIGINT) AS n_big,
          CAST(CASE WHEN len(list_filter(qs, x -> x >= 45)) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS has_jumbo,
          CAST(CASE WHEN len(list_filter(qs, x -> NOT (x > 0))) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS all_positive,
          CAST(list_sum(list_transform(qs, x -> x * x)) AS BIGINT) AS sum_sq,
          qs[-1] AS max_q
        FROM a WHERE l_orderkey % 97 = 0 ORDER BY l_orderkey"""),
      "Higher-order-function parity suite: transform/filter/exists/forall/" +
        "aggregate/sort over per-order quantity arrays vs DuckDB's list " +
        "functions — the lambda surface itself under the oracle."),

    "spatial_distance_join" -> Q(
      (s, d) => {
        import s.implicits._
        // 2-D spatial ε-join: all customer pairs within Euclidean distance
        // 100 on a derived 10000×10000 integer plane (coordinates are
        // deterministic key functions, replayed verbatim by the oracle —
        // the derived-partsupp discipline). operators.SpatialJoin: grid
        // cells of the radius side, 3×3-neighborhood replication on ONE
        // side so every qualifying pair meets exactly once, integer
        // Δx²+Δy² verify — one cell-keyed shuffle, never the N² cross
        // join the oracle replays.
        val pts = table(s, d, "customer").select($"c_custkey".as("id"),
          ($"c_custkey" * 31 % 10000).as("x"), ($"c_custkey" * 57 % 10000).as("y"))
        graft.operators.SpatialJoin.withinDistance(pts, r2 = 10000L, cell = 100L)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH p AS (SELECT c_custkey AS id,
            (c_custkey * 31) % 10000 AS x, (c_custkey * 57) % 10000 AS y
          FROM customer)
        SELECT a.id AS id_a, b.id AS id_b,
          CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
        FROM p a JOIN p b ON a.id < b.id
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 10000
        ORDER BY id_a, id_b"""),
      "2-D spatial epsilon-join via grid cells (3x3 neighborhood " +
        "replication, exact-once candidates, integer distance verify) — " +
        "one cell-keyed shuffle vs the oracle's N^2 replay."),

    "q4_order_priority" -> Q(
      (s, d) => {
        import s.implicits._
        // TPC-H Q4's shape on this schema: orders in a quarter with at
        // least one LATE line item (shipped > 90 days after the order
        // date), counted by priority. The EXISTS is a left-semi join with
        // the lateness predicate inside the join condition — one
        // co-partitioned shuffle pair, then an O(priorities) aggregate.
        val o = table(s, d, "orders")
          .filter($"o_orderdate" >= core.ts("1995-01-01") &&
            $"o_orderdate" < core.ts("1995-04-01"))
        val li = table(s, d, "lineitem").select($"l_orderkey", $"l_shipdate")
        o.join(li, o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"), "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "TPC-H Q4 shape (EXISTS late line item, count by priority): semi join " +
        "with the lateness predicate in the join condition, O(priorities) " +
        "aggregate."),

    "q22_sales_opportunity" -> Q(
      (s, d) => {
        import s.implicits._
        // TPC-H Q22's shape: wealthy-but-inactive customers — balance above
        // the average POSITIVE balance (broadcast scalar subquery), no
        // RECENT orders (anti join on the filtered order stream — pure
        // inactivity, Q22's NOT EXISTS), grouped by nation. Exact cents;
        // the avg floors once on both engines.
        val c = table(s, d, "customer")
          .select($"c_custkey", $"c_nationkey".cast(LongType).as("nation"),
            (dec2($"c_acctbal") * 100).cast(LongType).as("bal_c"))
        val avgPos = c.filter($"bal_c" > 0L)
          .agg(idiv(sum($"bal_c"), count(lit(1))).as("avg_bal_c"))
        c.crossJoin(broadcast(avgPos))
          .filter($"bal_c" > $"avg_bal_c")
          .join(table(s, d, "orders")
              .filter($"o_orderdate" >= core.ts("1999-01-01"))
              .select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"nation")
          .agg(count(lit(1)).as("n_custs"), sum($"bal_c").as("total_bal_c"))
          .orderBy($"nation")
      },
      Some("""WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
            CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
          FROM customer),
        a AS (SELECT CAST(sum(bal_c) AS BIGINT) // count(*) AS avg_bal_c
          FROM c WHERE bal_c > 0)
        SELECT nation, count(*) AS n_custs,
          CAST(sum(bal_c) AS BIGINT) AS total_bal_c
        FROM c, a
        WHERE c.bal_c > a.avg_bal_c
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY nation ORDER BY nation"""),
      "TPC-H Q22 shape (above-average balance, no recent orders, by nation): " +
        "broadcast scalar-subquery threshold + anti join + one aggregate, " +
        "exact integer cents."),

    "asof_join_native" -> Q(
      (s, d) => {
        import s.implicits._
        // q18's as-of frames through the CUSTOM PHYSICAL OPERATOR
        // (plans.AsOfJoinExec): Catalyst plans the children co-partitioned
        // by key and sorted by (key, time) — reusing any existing layout —
        // then one O(n+m) merge per partition with O(1) state replaces the
        // union+window's padded-frame sort. Same oracle as q18.
        val left = eventsTable(s, d)
          .select($"event_id", $"user_id", micros($"ts").as("tsu"))
        val right = table(s, d, "orders")
          .groupBy($"o_custkey", $"o_orderdate")
          .agg(max($"o_totalprice").as("o_val"))
          .select($"o_custkey", micros($"o_orderdate").as("otsu"),
            micros($"o_orderdate").as("asof_ts_us"), $"o_val")
        AsOfJoin.leftAsOfNative(left, right, "user_id", "o_custkey", "tsu", "otsu",
            Seq("asof_ts_us", "o_val"))
          .select($"event_id", $"user_id", $"tsu", $"asof_ts_us", $"o_val")
          .orderBy($"event_id")
      },
      Some("""WITH r AS (
          SELECT o_custkey AS k, epoch_us(o_orderdate) AS otsu, MAX(o_totalprice) AS o_val
          FROM orders GROUP BY 1, 2),
        l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
        SELECT l.event_id, l.user_id, l.tsu, r.otsu AS asof_ts_us, r.o_val
        FROM l ASOF LEFT JOIN r ON l.user_id = r.k AND l.tsu >= r.otsu
        ORDER BY l.event_id"""),
      "Native physical as-of join: custom LogicalPlan + SparkStrategy + " +
        "SparkPlan (SMJ distribution/ordering contract, O(n+m) streaming " +
        "merge, O(1) state) — the whole-operator extension path."),

    "asof_join_forward" -> Q(
      (s, d) => {
        import s.implicits._
        // FORWARD as-of: each event picks the EARLIEST order on/after it —
        // the "next shipment after the order" / "next quote after the
        // trade" direction the backward join can't express. Same
        // single-exchange union+window plan as q18, frame flipped to
        // [current, +∞) with first(ignoreNulls).
        val left = eventsTable(s, d)
          .select($"event_id", $"user_id", micros($"ts").as("tsu"))
        val right = table(s, d, "orders")
          .groupBy($"o_custkey", $"o_orderdate")
          .agg(max($"o_totalprice").as("o_val"))
          .select($"o_custkey", micros($"o_orderdate").as("otsu"),
            micros($"o_orderdate").as("next_ts_us"), $"o_val")
        AsOfJoin.leftAsOfForward(left, right, "user_id", "o_custkey", "tsu", "otsu",
            Seq("next_ts_us", "o_val"))
          .select($"event_id", $"user_id", $"tsu", $"next_ts_us", $"o_val")
          .orderBy($"event_id")
      },
      Some("""WITH r AS (
          SELECT o_custkey AS k, epoch_us(o_orderdate) AS otsu, MAX(o_totalprice) AS o_val
          FROM orders GROUP BY 1, 2),
        l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
        SELECT l.event_id, l.user_id, l.tsu, r.otsu AS next_ts_us, r.o_val
        FROM l ASOF LEFT JOIN r ON l.user_id = r.k AND l.tsu <= r.otsu
        ORDER BY l.event_id"""),
      "Forward as-of join (earliest right row at-or-after each left time): " +
        "the q18 union+window plan with a [current, +inf) first() frame — " +
        "still one exchange, inclusive at equal times."),

    "weighted_median" -> Q(
      (s, d) => {
        import s.implicits._
        // Quantity-WEIGHTED median price per returnflag — the weighted
        // quantile the plain median/percentile family can't express. The
        // running weight comes from PrefixSum's two-job range-exchange scan
        // (three flags = three window partitions would funnel 100 TB
        // through 3 tasks); the median is then the smallest price whose
        // inclusive cumulative weight covers half the total, 2·cum ≥ tot in
        // pure integers.
        val rows = table(s, d, "lineitem")
          .select($"l_returnflag".as("flag"),
            (dec2($"l_extendedprice") * 100).cast("long").as("price_c"),
            $"l_quantity".cast("long").as("qty"),
            $"l_orderkey", $"l_linenumber")
        val cum = graft.operators.PrefixSum.groupedRunningTotal(
          rows, Seq("flag"),
          Seq(col("price_c"), col("l_orderkey"), col("l_linenumber")), "qty", "cum")
        val tot = rows.groupBy($"flag").agg(sum($"qty").as("tot"))
        cum.join(broadcast(tot), "flag")
          .filter(lit(2L) * $"cum" >= $"tot")
          .groupBy($"flag", $"tot")
          .agg(min($"price_c").as("weighted_median_c"))
          .select($"flag", $"weighted_median_c", $"tot".as("total_qty"))
          .orderBy($"flag")
      },
      Some("""WITH r AS (SELECT l_returnflag AS flag,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
            CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber
          FROM lineitem),
        c AS (SELECT flag, price_c,
            CAST(sum(qty) OVER (PARTITION BY flag
              ORDER BY price_c, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
            CAST(sum(qty) OVER (PARTITION BY flag) AS BIGINT) AS tot
          FROM r)
        SELECT flag, min(price_c) AS weighted_median_c, tot AS total_qty
        FROM c WHERE 2 * cum >= tot GROUP BY flag, tot ORDER BY flag"""),
      "Quantity-weighted median price per group: distributed running weight " +
        "via PrefixSum (no 3-partition window funnel), median = smallest " +
        "price with 2x cumulative weight >= total, all-integer."),

    "abc_classification" -> Q(
      (s, d) => {
        import s.implicits._
        // ABC / Pareto revenue classification — the merchandising cut
        // behind "which 20% of parts carry 80% of revenue": parts rank by
        // revenue desc, the running share classifies A (≤ 80% cumulative),
        // B (≤ 95%), C (rest). The running total is PrefixSum's
        // range-exchange scan (a global ORDER BY revenue window would
        // funnel every part through one task); thresholds are integer
        // cross-multiplied (cum·100 vs tot·80 — no percentage floats).
        // e4, not cents: the money discipline's scale must keep every REAL
        // digit (price·discount products carry 4 fractional digits) — at a
        // narrower scale Spark HALF_UP-rounds where DuckDB's decimal
        // narrowing TRUNCATES (probed: CAST(1.159 AS DECIMAL(4,2)) = 1.15
        // there), and boundary parts would classify differently
        val rev = table(s, d, "lineitem")
          .groupBy($"l_partkey")
          .agg(moneyE(sum(revenue(s)), 4).as("rev_c"))
        val cum = graft.operators.PrefixSum.groupedRunningTotal(
          rev.withColumn("g", lit(0L)), Seq("g"),
          Seq(col("rev_c").desc, col("l_partkey")), "rev_c", "cum")
        val tot = rev.agg(sum($"rev_c").as("tot"))
        cum.crossJoin(broadcast(tot))
          .withColumn("cls",
            when($"cum" * 100 <= $"tot" * 80, "A")
              .when($"cum" * 100 <= $"tot" * 95, "B")
              .otherwise("C"))
          .groupBy($"cls")
          .agg(count(lit(1)).as("n_parts"), sum($"rev_c").as("class_rev_e4"),
            max($"rev_c").as("max_part_rev_e4"), min($"rev_c").as("min_part_rev_e4"))
          .orderBy($"cls")
      },
      Some(s"""WITH rev AS (SELECT l_partkey,
            ${moneyESql(s"SUM($revenueSql)", 4)} AS rev_c
          FROM lineitem GROUP BY 1),
        c AS (SELECT l_partkey, rev_c,
            CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
            CAST(sum(rev_c) OVER () AS BIGINT) AS tot
          FROM rev),
        k AS (SELECT *, CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS cls FROM c)
        SELECT cls, count(*) AS n_parts, CAST(sum(rev_c) AS BIGINT) AS class_rev_e4,
          max(rev_c) AS max_part_rev_e4, min(rev_c) AS min_part_rev_e4
        FROM k GROUP BY 1 ORDER BY 1"""),
      "ABC/Pareto revenue classification (A ≤ 80% cumulative share, B ≤ " +
        "95%, C rest): PrefixSum running total over the part aggregate, " +
        "integer cross-multiplied thresholds — no one-task global window."),

    "business_day_latency" -> Q(
      (s, d) => {
        import s.implicits._
        // BUSINESS-DAY shipping latency per order priority — the
        // calendar-aware duration the raw day difference misreports (a
        // Friday order shipping Monday is 1 business day, not 3). The
        // weekday count enumerates the (order, ship] day span with
        // sequence() and filters weekends — bounded by the latency (≤ ~4
        // months here), replayed verbatim by DuckDB's generate_series, so
        // both engines share one obviously-correct counting rule rather
        // than mirrored closed-form dow CASE tables. ISO dow via
        // date_format 'E' ≡ dayname() prefixes (the date_parts_suite
        // discipline); avg emitted as an exact e6 integer quotient.
        val firstShip = table(s, d, "lineitem")
          .groupBy($"l_orderkey").agg(min($"l_shipdate").as("ship"))
        val lat = table(s, d, "orders")
          .join(firstShip, $"o_orderkey" === $"l_orderkey")
          .select($"o_orderpriority",
            // guard: the synthetic corpus has ship-before-order rows
            // (latency would be negative) — clamp to 0 on BOTH engines
            // (Spark's sequence(start > stop) DESCENDS where DuckDB's
            // generate_series is empty, so the unguarded forms diverge)
            when($"ship".cast("date") >= date_add($"o_orderdate".cast("date"), 1),
              size(filter(
                sequence(date_add($"o_orderdate".cast("date"), 1),
                  $"ship".cast("date")),
                dd => !date_format(dd, "E").isin("Sat", "Sun"))).cast("long"))
              .otherwise(0L).as("bdays"))
        lat.groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), sum($"bdays").as("sum_bdays"),
            idiv(lit(1000000L) * sum($"bdays"), count(lit(1))).as("avg_bdays_e6"))
          .orderBy($"o_orderpriority")
      },
      Some("""WITH fs AS (SELECT l_orderkey, min(l_shipdate) AS ship
          FROM lineitem GROUP BY 1),
        lat AS (SELECT o_orderpriority,
            CAST(CASE WHEN CAST(ship AS DATE) >= CAST(o_orderdate AS DATE) + 1
              THEN len(list_filter(
                generate_series(CAST(o_orderdate AS DATE) + 1, CAST(ship AS DATE),
                  INTERVAL 1 DAY),
                dd -> dayofweek(dd) NOT IN (0, 6)))
              ELSE 0 END AS BIGINT) AS bdays
          FROM orders JOIN fs ON o_orderkey = l_orderkey)
        SELECT o_orderpriority, count(*) AS n_orders,
          CAST(sum(bdays) AS BIGINT) AS sum_bdays,
          CAST((1000000 * CAST(sum(bdays) AS HUGEINT)) // count(*) AS BIGINT)
            AS avg_bdays_e6
        FROM lat GROUP BY 1 ORDER BY 1"""),
      "Business-day shipping latency per priority (weekends excluded): " +
        "bounded day-span enumeration shared verbatim by both engines, " +
        "exact e6 average."),

    "weighted_quantiles" -> Q(
      (s, d) => {
        import s.implicits._
        // Quantity-weighted QUARTILES per returnflag — the full weighted-
        // quantile readout weighted_median is the p50 member of (weighted
        // p25/p75 bound pricing bands the unweighted percentile family
        // mis-centers when big lots dominate). Same machinery, ONE
        // PrefixSum running-weight scan serving all three cut points:
        // q(p) = smallest price whose inclusive cumulative weight covers
        // p of the total — 4·cum ≥ tot, 2·cum ≥ tot, 4·cum ≥ 3·tot, all
        // integer cross-multiplied, one conditional-min aggregate.
        val rows = table(s, d, "lineitem")
          .select($"l_returnflag".as("flag"),
            (dec2($"l_extendedprice") * 100).cast("long").as("price_c"),
            $"l_quantity".cast("long").as("qty"),
            $"l_orderkey", $"l_linenumber")
        val cum = graft.operators.PrefixSum.groupedRunningTotal(
          rows, Seq("flag"),
          Seq(col("price_c"), col("l_orderkey"), col("l_linenumber")), "qty", "cum")
        val tot = rows.groupBy($"flag").agg(sum($"qty").as("tot"))
        cum.join(broadcast(tot), "flag")
          .groupBy($"flag", $"tot")
          .agg(
            min(when(lit(4L) * $"cum" >= $"tot", $"price_c")).as("p25_c"),
            min(when(lit(2L) * $"cum" >= $"tot", $"price_c")).as("p50_c"),
            min(when(lit(4L) * $"cum" >= lit(3L) * $"tot", $"price_c")).as("p75_c"))
          .select($"flag", $"p25_c", $"p50_c", $"p75_c", $"tot".as("total_qty"))
          .orderBy($"flag")
      },
      Some("""WITH r AS (SELECT l_returnflag AS flag,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
            CAST(l_quantity AS BIGINT) AS qty, l_orderkey, l_linenumber
          FROM lineitem),
        c AS (SELECT flag, price_c,
            CAST(sum(qty) OVER (PARTITION BY flag
              ORDER BY price_c, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
            CAST(sum(qty) OVER (PARTITION BY flag) AS BIGINT) AS tot
          FROM r)
        SELECT flag,
          min(CASE WHEN 4 * cum >= tot THEN price_c END) AS p25_c,
          min(CASE WHEN 2 * cum >= tot THEN price_c END) AS p50_c,
          min(CASE WHEN 4 * cum >= 3 * tot THEN price_c END) AS p75_c,
          tot AS total_qty
        FROM c GROUP BY flag, tot ORDER BY flag"""),
      "Quantity-weighted quartiles per group: ONE PrefixSum running-weight " +
        "scan serves p25/p50/p75 via integer cross-multiplied coverage " +
        "tests in a single conditional-min aggregate."),

    "asof_join_tolerance" -> Q(
      (s, d) => {
        import s.implicits._
        // As-of join with a staleness bound (the kdb `wj`/Pandas
        // `merge_asof(tolerance=)` semantics): a match older than 7 days is
        // no match at all — stale reference data is worse than none. Routed
        // through the NATIVE physical as-of (plans.AsOfJoinExec) since r8:
        // the tolerance is one register comparison in the O(n+m) merge
        // loop, which NULLs the whole payload atomically — no padded union
        // frame, no window buffer, and the measured ~1.4× native win now
        // reaches the staleness-bounded variant.
        val tolUs = 7L * 86400000000L
        val left = eventsTable(s, d)
          .select($"event_id", $"user_id", micros($"ts").as("tsu"))
        val right = table(s, d, "orders")
          .groupBy($"o_custkey", $"o_orderdate")
          .agg(max($"o_totalprice").as("o_val"))
          .select($"o_custkey", micros($"o_orderdate").as("otsu"),
            micros($"o_orderdate").as("asof_ts_us"), $"o_val")
        AsOfJoin.leftAsOfNative(left, right, "user_id", "o_custkey", "tsu", "otsu",
            Seq("asof_ts_us", "o_val"), toleranceUs = Some(tolUs))
          .select($"event_id", $"user_id", $"tsu", $"asof_ts_us", $"o_val")
          .orderBy($"event_id")
      },
      Some("""WITH r AS (
          SELECT o_custkey AS k, epoch_us(o_orderdate) AS otsu, MAX(o_totalprice) AS o_val
          FROM orders GROUP BY 1, 2),
        l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
        SELECT l.event_id, l.user_id, l.tsu,
          CASE WHEN l.tsu - r.otsu <= 604800000000 THEN r.otsu END AS asof_ts_us,
          CASE WHEN l.tsu - r.otsu <= 604800000000 THEN r.o_val END AS o_val
        FROM l ASOF LEFT JOIN r ON l.user_id = r.k AND l.tsu >= r.otsu
        ORDER BY l.event_id"""),
      "As-of join with a 7-day staleness tolerance (merge_asof semantics): stale " +
        "matches NULL out atomically, zero extra exchanges over the plain as-of plan."),

    "q19_range_join" -> Q(
      (s, d) => {
        import s.implicits._
        val bands = s.createDataFrame(Seq(
          (0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 51.0, "high")))
          .toDF("lo", "hi", "band")
        table(s, d, "lineitem")
          .join(broadcast(bands), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n"), moneyE(sum(dec4($"l_quantity")), 4).as("sum_qty_e4"),
            moneyE(sum(revenue(s)), 6).as("band_revenue_e6"))
          .orderBy($"band")
      },
      Some(s"""SELECT band, COUNT(*) AS n,
        ${moneyESql("SUM(CAST(l_quantity AS DECIMAL(18,4)))", 4)} AS sum_qty_e4,
        ${moneyESql(s"SUM($revenueSql)", 6)} AS band_revenue_e6
        FROM lineitem JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 51.0, 'high'))
          AS b(lo, hi, band) ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band ORDER BY band"""),
      "band/range join against a broadcast interval table"),

    "q20_pivot" -> Q(
      (s, d) => {
        import s.implicits._
        eventsTable(s, d)
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
        CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY user_id ORDER BY user_id"""),
      "pivot event_type -> columns (explicit value list keeps plan one-pass)"),

    "freq_tokens_topk" -> Q(
      (s, d) => {
        import s.implicits._
        table(s, d, "documents")
          .select(explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"token")
          .limit(50)
      },
      Some("""SELECT token, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token FROM documents) t
        GROUP BY token ORDER BY cnt DESC, token LIMIT 50"""),
      "exact frequent items over exploded tokens"),

    "freq_tokens_topk_approx" -> Q(
      (s, d) => {
        import s.implicits._
        // Mergeable count-min sketch over the exploded tokens, FULL-ORACLE
        // since r14: the registered row runs the replayable CMS twin — 4
        // Carter–Wegman rows × 8192 counters over the rolling-hash token
        // fingerprint, estimate = min over rows — every counter plain
        // integer SQL DuckDB recomputes exactly. The 100 TB shape is
        // intact: per-partition partial counts merge by sum (map-side
        // combine), ≤ 4·8192 counter rows ever cross the wire, and the 50
        // probes join against the tiny counter frame (broadcast). The
        // binary Spark CountMinSketch production path stays as
        // [[freqTokensTopkNative]], ApproxSpec-checked.
        val tokens = table(s, d, "documents")
          .select(explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))).as("token"))
        def withBuckets(df: DataFrame, keep: Seq[String]): DataFrame = df
          .select(keep.map(col) :+ explode(array((0 until 4).map(i =>
            struct(lit(i).as("i"), cmsBucket($"x", i).as("bkt"))): _*)).as("e"): _*)
          .select(keep.map(col) ++ Seq($"e.i".as("i"), $"e.bkt".as("bkt")): _*)
        val counters = withBuckets(
            tokens.withColumn("x", graft.functions.rolling_hash($"token")), Nil)
          .groupBy($"i", $"bkt").agg(count(lit(1)).as("c"))
        val top = tokens.groupBy($"token").agg(count(lit(1)).as("exact_cnt"))
          .orderBy($"exact_cnt".desc, $"token").limit(50)
          .withColumn("x", graft.functions.rolling_hash($"token"))
        withBuckets(top, Seq("token", "exact_cnt"))
          .join(counters, Seq("i", "bkt"), "left")
          .groupBy($"token", $"exact_cnt")
          .agg(min(coalesce($"c", lit(0L))).as("est_cnt"))
          .orderBy($"exact_cnt".desc, $"token")
      },
      Some(s"""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
          FROM documents),
        hf(i, a, b) AS (VALUES (0, ${CmsA(0)}, ${CmsB(0)}), (1, ${CmsA(1)}, ${CmsB(1)}),
          (2, ${CmsA(2)}, ${CmsB(2)}), (3, ${CmsA(3)}, ${CmsB(3)})),
        tx AS (SELECT ${rollingHashSql("token")} AS x FROM tok),
        ib AS (SELECT hf.i, CAST(((CAST(hf.a AS HUGEINT) * tx.x + hf.b) % $SkMod)
            % $CmsW AS BIGINT) AS bkt FROM tx CROSS JOIN hf),
        cnt AS (SELECT i, bkt, COUNT(*) AS c FROM ib GROUP BY 1, 2),
        top AS (SELECT token, COUNT(*) AS exact_cnt FROM tok GROUP BY 1
          ORDER BY exact_cnt DESC, token LIMIT 50),
        px AS (SELECT token, exact_cnt, ${rollingHashSql("token")} AS x FROM top),
        pib AS (SELECT token, exact_cnt, hf.i,
            CAST(((CAST(hf.a AS HUGEINT) * px.x + hf.b) % $SkMod)
              % $CmsW AS BIGINT) AS bkt FROM px CROSS JOIN hf)
        SELECT pib.token, pib.exact_cnt, MIN(COALESCE(cnt.c, 0)) AS est_cnt
        FROM pib LEFT JOIN cnt USING (i, bkt)
        GROUP BY 1, 2 ORDER BY exact_cnt DESC, token"""),
      "Approximate frequent items — the REPLAYABLE count-min twin as the " +
        "standing oracle (4 Carter-Wegman rows x 8192 counters over the " +
        "rolling-hash fingerprint, min-of-rows estimate; map-side partial " +
        "counts = the mergeable-sketch shape); the binary CountMinSketch " +
        "path stays error-bound-checked in ApproxSpec."),

    "approx_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        // FULL-ORACLE since r14 (VERDICT r13 #2): the registered row runs
        // the replayable HLL twin — real 256-register HyperLogLog (register
        // index = h mod 256, ρ = leading-zero rank of the remaining 53 bits,
        // raw estimate = the exact α_m·m²/Σ2^(−Mj) rational, linear-counting
        // small-range switch) over the (x+C)^17 mod 2^61−1 permutation hash,
        // every step integer SQL DuckDB replays bit-for-bit. The native
        // production path (Spark approx_count_distinct) stays as
        // [[approxDistinctNative]], error-bound-checked in ApproxSpec.
        // Scale: ONE scan, map-side partial register max, ≤ 256 register
        // rows per aggregation — the mergeable-sketch shape.
        val ev = eventsTable(s, d)
        hllEst(hllRegs(ev, Nil, $"user_id"), Nil, "approx_users")
          .crossJoin(hllEst(hllRegs(ev, Nil, $"event_id"), Nil, "approx_events"))
      },
      Some(s"""WITH ${hllSql("user_id", "u", grouped = false)},
        ${hllSql("event_id", "w", grouped = false)}
        SELECT ue.est AS approx_users, we.est AS approx_events FROM ue, we"""),
      "HLL approximate distinct — the REPLAYABLE register twin as the " +
        "standing oracle (x^17 mod 2^61-1 permutation hash, exact rational " +
        "estimator, inlined linear-counting table); the native " +
        "approx_count_distinct path stays error-bound-checked in ApproxSpec."),

    "approx_distinct_by_group" -> Q(
      (s, d) => {
        import s.implicits._
        // MERGEABLE distinct-count sketches, FULL-ORACLE since r14: one
        // pass builds per-group HLL registers, and the global "ALL" figure
        // is a register-wise MAX of the per-group registers — a genuine
        // SKETCH union, never a second scan of the raw data. This is the
        // property that matters at 100 TB: per-partition partial registers
        // combine associatively, and downstream rollups (per-day →
        // per-month → all-time) reuse stored sketches instead of raw rows.
        // Replayable twin discipline as in approx_distinct; the DataSketches
        // production path (hll_sketch_agg / hll_union_agg) stays as
        // [[approxDistinctByGroupNative]], ApproxSpec-checked.
        val regs = hllRegs(eventsTable(s, d), Seq("event_type"), $"user_id")
        val allRegs = regs.groupBy($"j")
          .agg(max($"mj").as("mj")) // register-wise max ≡ HLL sketch union
          .select(lit("ALL").as("event_type"), $"j", $"mj")
          .unionByName(regs)
        hllEst(allRegs, Seq("event_type"), "approx_users")
          .orderBy($"event_type")
      },
      Some(s"""WITH ${hllSql("user_id", "g", grouped = true, withAllUnion = true)}
        SELECT t AS event_type, est AS approx_users FROM ge ORDER BY 1"""),
      "Per-group distinct-user sketches + their union in one pass — the " +
        "replayable HLL register twin (union = register-wise max, the " +
        "mergeable-sketch property itself oracle-checked); the DataSketches " +
        "path stays error-bound-checked in ApproxSpec."),

    "q21_correlated_avg" -> Q(
      (s, d) => {
        import s.implicits._
        // The correlated-scalar-subquery shape ("orders above their
        // customer's average"), decorrelated the Spark-first way: ONE window
        // over the customer partition instead of a per-row subquery or a
        // groupBy+re-join (one shuffle by o_custkey, no second scan).
        // Exactness: the comparison runs in DECIMAL (price*n vs sum), which
        // is order-independent - comparing against an avg of DOUBLEs would
        // be bit-fragile across engines.
        val w = Window.partitionBy($"o_custkey")
        table(s, d, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice",
            sum($"o_totalprice".cast("decimal(18,2)")).over(w).as("sum_t"),
            count(lit(1)).over(w).as("n_orders"))
          .filter($"o_totalprice".cast("decimal(18,2)") * $"n_orders" > $"sum_t")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"n_orders")
          .orderBy($"o_orderkey")
      },
      Some("""WITH x AS (SELECT o_orderkey, o_custkey, o_totalprice,
            sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS sum_t,
            count(*) OVER (PARTITION BY o_custkey) AS n_orders
          FROM orders)
        SELECT o_orderkey, o_custkey, o_totalprice, CAST(n_orders AS BIGINT) AS n_orders
        FROM x WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n_orders > sum_t
        ORDER BY o_orderkey"""),
      "Correlated scalar subquery (above-customer-average orders), decorrelated " +
        "into one window pass; decimal comparison for cross-engine exactness."),

    "set_ops" -> Q(
      (s, d) => {
        import s.implicits._
        val buyers = eventsTable(s, d).filter($"event_type" === "purchase")
          .select($"user_id").distinct()
        val clickers = eventsTable(s, d).filter($"event_type" === "click")
          .select($"user_id").distinct()
        buyers.intersect(clickers).withColumn("cohort", lit("both"))
          .unionByName(buyers.except(clickers).withColumn("cohort", lit("buy_only")))
          .orderBy($"cohort", $"user_id")
      },
      Some("""SELECT user_id, 'both' AS cohort FROM
          (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
           INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        UNION ALL
        SELECT user_id, 'buy_only' AS cohort FROM
          (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
           EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        ORDER BY cohort, user_id"""),
      "INTERSECT / EXCEPT cohort analysis over distinct key sets"),

    "bucketed_join_agg" -> Q(
      (s, d) => {
        import s.implicits._
        // Co-located join via bucketing: both sides are written bucketed by
        // the join key into the session catalog, so the join needs NO
        // exchange — each task reads matching bucket files from both sides
        // (asserted with broadcast disabled in PlanAuditSpec). At 100 TB
        // this is the pattern that amortizes one organize-write across every
        // subsequent join on the key; the only shuffle left in this plan is
        // the final tiny group-by.
        // drop catalog entries AND their warehouse dirs (a leftover dir from
        // a crashed prior run blocks CREATE with LOCATION_ALREADY_EXISTS)
        for (t <- Seq("graft_orders_bkt", "graft_customer_bkt")) {
          s.sql(s"DROP TABLE IF EXISTS $t")
          val loc = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir") + s"/$t")
          loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
        }
        table(s, d, "orders").select($"o_custkey", $"o_totalprice")
          .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable("graft_orders_bkt")
        table(s, d, "customer").select($"c_custkey", $"c_mktsegment")
          .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable("graft_customer_bkt")
        s.table("graft_orders_bkt")
          .join(s.table("graft_customer_bkt"), $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            moneyE(sum(dec2($"o_totalprice")), 2).as("total_price_e2"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
        ${moneyESql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS total_price_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      "Bucket-co-located join: both sides pre-bucketed on the key, join runs exchange-free"),

    "bloom_filter_join" -> Q(
      (s, d) => {
        import s.implicits._
        // Manual runtime bloom pruning: a selective dimension (one market
        // segment's customers) builds a bloom filter over its keys; the fact
        // side (orders) is probe-filtered BEFORE its shuffle, so only
        // ~matching + fpp*rest rows move. The join afterwards removes the
        // false positives - the result is provably the plain join's
        // (asserted against it in PlanAuditSpec, plus the plan shape: the
        // probe sits inside the scan's codegen span, upstream of the
        // exchange).
        val dim = table(s, d, "customer")
          .filter($"c_mktsegment" === "AUTOMOBILE")
          .select($"c_custkey", $"c_nationkey")
        val fact = table(s, d, "orders")
          .select($"o_custkey", $"o_totalprice", $"o_orderpriority")
        graft.operators.BloomJoin.join(fact, "o_custkey", dim, "c_custkey",
            expectedItems = 100000L)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            moneyE(sum(dec2($"o_totalprice")), 2).as("total_price_e2"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
        ${moneyESql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS total_price_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'AUTOMOBILE'
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "Bloom-prefiltered join: dim-side bloom probe drops non-matching fact rows " +
        "before the shuffle; exact result (false positives removed by the join)"),

    "q12b_cube" -> Q(
      (s, d) => {
        import s.implicits._
        // CUBE over (status, priority): all four grouping sets in one pass,
        // disambiguated by grouping_id - the other half of the grouping-sets
        // surface next to q12's ROLLUP. Spark expands the cube before the
        // partial aggregate, so it is still one shuffle.
        table(s, d, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
            moneyE(sum(dec2($"o_totalprice")), 2).as("total_e2"))
          .orderBy($"gid", $"o_orderstatus", $"o_orderpriority")
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority,
          CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
          COUNT(*) AS n,
          ${moneyESql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS total_e2
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus, o_orderpriority"""),
      "CUBE grouping sets with grouping_id disambiguation (one-shuffle expansion)"),

    "rolling_window_range" -> Q(
      (s, d) => {
        import s.implicits._
        // Trailing 7-day per-user aggregates with a RANGE (time-interval)
        // frame - unlike q8's ROWS frame, peers are defined by event-time
        // distance, so gaps and ties are handled by the frame itself. The
        // frame runs on unix-micros BIGINTs (engine-neutral; no calendar
        // arithmetic), one shuffle by user.
        val w = Window.partitionBy($"user_id").orderBy($"us")
          .rangeBetween(-604800000000L, 0L) // 7 days of micros, inclusive
        eventsTable(s, d)
          .filter($"user_id" % 10 === 0)
          .select($"event_id", $"user_id", micros($"ts").as("us"),
            dec2($"value").as("v"))
          .withColumn("n_7d", count(lit(1)).over(w))
          .withColumn("sum_7d_e2", moneyE(sum($"v").over(w), 2))
          .select($"event_id", $"user_id", $"us", $"n_7d", $"sum_7d_e2")
          .orderBy($"event_id")
      },
      Some(s"""SELECT event_id, user_id, epoch_us(ts) AS us,
          count(*) OVER w AS n_7d,
          ${moneyESql("SUM(CAST(value AS DECIMAL(18,2))) OVER w", 2)} AS sum_7d_e2
        FROM events WHERE user_id % 10 = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id"""),
      "Trailing 7-day RANGE-frame window per user (time-distance peers, " +
        "decimal-exact sums)"),

    "unpivot_melt" -> Q(
      (s, d) => {
        import s.implicits._
        // Wide -> long reshape (the inverse of q20_pivot): four metric
        // columns melt into (metric, value) rows. Pure per-row expansion,
        // no shuffle except the output sort.
        table(s, d, "lineitem")
          .filter($"l_orderkey" < 100)
          .unpivot(
            Array($"l_orderkey", $"l_linenumber"),
            Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
            "metric", "value")
          .orderBy($"l_orderkey", $"l_linenumber", $"metric")
      },
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
            FROM lineitem WHERE l_orderkey < 100
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
            FROM lineitem WHERE l_orderkey < 100
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
            FROM lineitem WHERE l_orderkey < 100
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
            FROM lineitem WHERE l_orderkey < 100)
        ORDER BY l_orderkey, l_linenumber, metric"""),
      "UNPIVOT/melt: wide metric columns to long (metric, value) rows"),

    "gap_fill" -> Q(
      (s, d) => {
        import s.implicits._
        // Time-series gap filling: each user's hourly series is completed
        // over [first, last] active hour and empty hours carry the previous
        // hour's value forward. The fill is the as-of join operator (one
        // shuffle by user, one ordered window) - the same primitive that
        // fills sensor/price series at 100 TB; the hour grid explodes from
        // two ints per user, never materializing on the driver.
        val hourly = eventsTable(s, d)
          .filter($"user_id" % 10 === 0)
          .groupBy($"user_id", expr("unix_micros(ts) DIV 3600000000").as("hr"))
          .agg(expr("max_by(value, event_id)").as("hr_value"))
          .withColumn("src_hr", $"hr")
        val grid = hourly.groupBy($"user_id".as("g_user"))
          .agg(min($"hr").as("h0"), max($"hr").as("h1"))
          .select($"g_user", explode(sequence($"h0", $"h1")).as("g_hr"))
        AsOfJoin.leftAsOf(grid, hourly, "g_user", "user_id", "g_hr", "hr",
            Seq("hr_value", "src_hr"))
          .select($"g_user".as("user_id"), $"g_hr".as("hr"),
            $"hr_value", ($"src_hr" =!= $"g_hr").as("is_gap"))
          .orderBy($"user_id", $"hr")
      },
      Some("""WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
            arg_max(value, event_id) AS hr_value FROM events
          WHERE user_id % 10 = 0 GROUP BY 1, 2),
        b AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY user_id),
        g AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM b)
        SELECT g.user_id, g.hr, h.hr_value, (h.hr <> g.hr) AS is_gap
        FROM g ASOF JOIN h ON g.user_id = h.user_id AND g.hr >= h.hr
        ORDER BY g.user_id, g.hr"""),
      "Hourly gap filling with as-of forward fill per user (grid from " +
        "per-user bounds, carried values, gap flag)"),

    "percent_rank_normalize" -> Q(
      (s, d) => {
        import s.implicits._
        // Rank-based normalization (the quantile-transform feature scaler):
        // value -> its percent rank within the event type, deterministic via
        // the event_id tiebreak. One shuffle by event_type; hot types skew a
        // window like this at 100 TB - the mergeable-sketch alternative is
        // event_value_quantiles_approx, which trades exactness for
        // partition-local work.
        val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
        eventsTable(s, d)
          .select($"event_id", $"event_type", $"value")
          .withColumn("pct", percent_rank().over(w))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, event_type, value,
          percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pct
        FROM events ORDER BY event_id"""),
      "Percent-rank (quantile-transform) normalization per group, " +
        "deterministic tiebreak"),

    "funnel_analysis" -> Q(
      (s, d) => {
        import s.implicits._
        // Ordered-event funnel (view -> click after it -> purchase after
        // that), the standard product-analytics query. Each stage is a
        // keyed aggregation joined to the previous stage's per-user
        // timestamp, so every join/agg shares the user_id partitioning -
        // three co-partitioned shuffles, no window over the full event log.
        val ev = eventsTable(s, d).select($"user_id", $"event_type", micros($"ts").as("us"))
        val viewed = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"us").as("t_view"))
        val clicked = ev.filter($"event_type" === "click")
          .join(viewed, "user_id").filter($"us" > $"t_view")
          .groupBy($"user_id").agg(min($"us").as("t_click"))
        val purchased = ev.filter($"event_type" === "purchase")
          .join(clicked, "user_id").filter($"us" > $"t_click")
          .groupBy($"user_id").agg(min($"us").as("t_purchase"))
        viewed.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"))
          .unionByName(clicked.agg(lit("2_click").as("stage"), count(lit(1)).as("n_users")))
          .unionByName(purchased.agg(lit("3_purchase").as("stage"), count(lit(1)).as("n_users")))
          .orderBy($"stage")
      },
      Some("""WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_click FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click GROUP BY e.user_id)
        SELECT '1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT '2_click', count(*) FROM c
        UNION ALL SELECT '3_purchase', count(*) FROM p
        ORDER BY stage"""),
      "Ordered event funnel: per-stage user counts, each stage keyed off the " +
        "previous stage's first-event time"),

    "funnel_conversion_windows" -> Q(
      (s, d) => {
        import s.implicits._
        // Funnel with PER-STAGE CONVERSION WINDOWS (the product-analytics
        // "convert within N days" semantics funnel_analysis lacks): the
        // click must land within 1 day of the first view, the purchase
        // within 2 days of that click — each stage's window is its own,
        // measured from the PREVIOUS stage's qualifying event, not job
        // time. Same co-partitioned per-stage aggregation shape (three
        // user_id-keyed joins+aggs, no global window); per-stage latency
        // reported as floored integer-microsecond averages, exact in both
        // engines.
        val w1 = 1L * 86400000000L; val w2 = 2L * 86400000000L
        val ev = eventsTable(s, d).select($"user_id", $"event_type", micros($"ts").as("us"))
        val viewed = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"us").as("t_view"))
        val clicked = ev.filter($"event_type" === "click")
          .join(viewed, "user_id")
          .filter($"us" > $"t_view" && $"us" <= $"t_view" + w1)
          .groupBy($"user_id").agg(min($"us").as("t_click"), min($"t_view").as("t_view0"))
        val purchased = ev.filter($"event_type" === "purchase")
          .join(clicked, "user_id")
          .filter($"us" > $"t_click" && $"us" <= $"t_click" + w2)
          .groupBy($"user_id").agg(min($"us").as("t_purchase"), min($"t_click").as("t_click0"))
        viewed.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"),
            lit(-1L).as("avg_lat_us"))
          .unionByName(clicked.agg(lit("2_click").as("stage"), count(lit(1)).as("n_users"),
            idiv(sum($"t_click" - $"t_view0"), count(lit(1))).as("avg_lat_us")))
          .unionByName(purchased.agg(lit("3_purchase").as("stage"), count(lit(1)).as("n_users"),
            idiv(sum($"t_purchase" - $"t_click0"), count(lit(1))).as("avg_lat_us")))
          .orderBy($"stage")
      },
      Some(s"""WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_click, min(v.t_view) AS t_view0
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
            AND epoch_us(e.ts) <= v.t_view + ${1L * 86400000000L}
          GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase, min(c.t_click) AS t_click0
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
            AND epoch_us(e.ts) <= c.t_click + ${2L * 86400000000L}
          GROUP BY e.user_id)
        SELECT '1_view' AS stage, count(*) AS n_users, CAST(-1 AS BIGINT) AS avg_lat_us FROM v
        UNION ALL SELECT '2_click', count(*),
          CAST(sum(t_click - t_view0) AS BIGINT) // count(*) FROM c
        UNION ALL SELECT '3_purchase', count(*),
          CAST(sum(t_purchase - t_click0) AS BIGINT) // count(*) FROM p
        ORDER BY stage"""),
      "Funnel with per-stage conversion windows (click within 1d of first " +
        "view, purchase within 2d of that click) + floored integer average " +
        "stage latencies — co-partitioned per-stage aggregation, no global window."),

    "retention_cohorts" -> Q(
      (s, d) => {
        import s.implicits._
        // Cohort retention triangle: users grouped by first-active week,
        // distinct-user counts per (cohort, weeks-since-cohort). Weeks are
        // epoch-microsecond integer buckets (7*86400*1e6), identical in any
        // engine - no calendar/timezone semantics to disagree on.
        val ev = eventsTable(s, d)
          .select($"user_id", expr("unix_micros(ts) DIV 604800000000").as("wk"))
        val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
        ev.join(cohort, "user_id")
          .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("week_offset"))
          .agg(countDistinct($"user_id").as("n_users"))
          .orderBy($"cohort_wk", $"week_offset")
      },
      Some("""WITH a AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        c AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY user_id)
        SELECT cohort_wk, wk - cohort_wk AS week_offset,
          count(DISTINCT a.user_id) AS n_users
        FROM a JOIN c ON a.user_id = c.user_id
        GROUP BY cohort_wk, week_offset ORDER BY cohort_wk, week_offset"""),
      "Weekly cohort retention counts over engine-neutral epoch-week buckets"),

    "outlier_trim" -> Q(
      (s, d) => {
        import s.implicits._
        // Winsorization-style robust trimming: exact per-type p05/p95 bounds
        // (sort-based percentile; the GK sketch in event_value_quantiles_
        // approx is the 100 TB path), broadcast back onto the events, and
        // per-type survivor stats. No double summation anywhere - counts and
        // min/max only, so both engines agree bitwise.
        val bounds = eventsTable(s, d)
          .groupBy($"event_type")
          .agg(expr("percentile(value, 0.05)").as("p05"),
            expr("percentile(value, 0.95)").as("p95"))
        val kept = $"value" >= $"p05" && $"value" <= $"p95"
        eventsTable(s, d)
          .join(broadcast(bounds), Seq("event_type"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_total"),
            count(when(kept, 1)).as("n_kept"),
            min(when(kept, $"value")).as("kept_min"),
            max(when(kept, $"value")).as("kept_max"),
            min($"p05").as("p05"), min($"p95").as("p95"))
          .orderBy($"event_type")
      },
      Some("""WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS p05,
          quantile_cont(value, 0.95) AS p95 FROM events GROUP BY event_type)
        SELECT e.event_type, COUNT(*) AS n_total,
          COUNT(*) FILTER (value >= p05 AND value <= p95) AS n_kept,
          MIN(value) FILTER (value >= p05 AND value <= p95) AS kept_min,
          MAX(value) FILTER (value >= p05 AND value <= p95) AS kept_max,
          MIN(p05) AS p05, MIN(p95) AS p95
        FROM events e JOIN b USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type"""),
      "Percentile-bounded outlier trimming per group (exact p05/p95 bounds, " +
        "broadcast back, survivor counts and extrema)"),

    "salted_join_agg" -> Q(
      (s, d) => {
        import s.implicits._
        val fact = table(s, d, "orders")
          .select($"o_custkey".as("c_custkey"), $"o_totalprice")
        val dim = table(s, d, "customer").select($"c_custkey", $"c_mktsegment")
        graft.operators.SkewJoin.saltedJoin(fact, dim, "c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            moneyE(sum(dec2($"o_totalprice")), 2).as("total_price_e2"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
        ${moneyESql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS total_price_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      "Skew-safe salted join (hash-salted fact × replicated dim) — provably identical to the plain join"),

    "json_extract_agg" -> Q(
      (s, d) => {
        import s.implicits._
        eventsTable(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
          .groupBy($"event_type")
          .agg(count($"k").as("n_with_k"), sum($"k").cast(LongType).as("sum_k"),
            min($"k").as("min_k"), max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
        min(k) AS min_k, max(k) AS max_k
        FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        GROUP BY event_type ORDER BY event_type"""),
      "Semi-structured extraction: JSON path into typed column, aggregated per shard"),

    "event_value_histogram" -> Q(
      (s, d) => {
        import s.implicits._
        eventsTable(s, d)
          .withColumn("bucket", least(floor($"value" / 50.0).cast(LongType), lit(9L)))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            moneyE(sum(dec4($"value")), 4).as("sum_value_e4"))
          .orderBy($"bucket")
      },
      Some(s"""SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
        COUNT(*) AS n, ${moneyESql("SUM(CAST(value AS DECIMAL(18,4)))", 4)} AS sum_value_e4
        FROM events GROUP BY 1 ORDER BY 1"""),
      "Fixed-width histogram with a capped overflow bucket (portable bucket arithmetic)"),

    "event_value_quantiles" -> Q(
      (s, d) => {
        import s.implicits._
        // Spark's exact `percentile` interpolates identically to DuckDB's
        // quantile_cont (lower + (upper-lower)·frac) — verified bit-exact.
        eventsTable(s, d)
          .groupBy($"event_type")
          .agg(expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.95)").as("p95"),
            count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, quantile_cont(value, 0.5) AS p50,
        quantile_cont(value, 0.95) AS p95, COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "Exact interpolated quantiles per group (sort-based; approx sketches are the 100 TB path)"),

    "event_value_quantiles_approx" -> Q(
      (s, d) => {
        import s.implicits._
        // The 100 TB quantile path, FULL-ORACLE since r14. GK itself cannot
        // be cross-engine-replayed — a GK summary's internal tuples depend
        // on INSERTION ORDER, which a distributed scan does not fix — so
        // the registered row runs the order-FREE mergeable rank summary: a
        // deterministic 1/64 hash-sample of rows (LCG on the unique
        // event_id — merge of samples = union, the mergeable property) with
        // EXACT lower-quantile ranks over the bounded sample, every step
        // integer/raw-value SQL DuckDB replays bit-for-bit. Rank error
        // O(1/√(n/64)) is spec-bounded in ApproxSpec; the GK production
        // path (approx_percentile, rank error ≤ 1/accuracy) stays as
        // [[eventQuantilesGkNative]], also ApproxSpec-bounded.
        val base = eventsTable(s, d).select($"event_type", $"value", $"event_id")
        val lcg = pmod($"event_id".cast(d38) * lit(SkA).cast(d38)
          + lit(SkC).cast(d38), lit(SkMod).cast(d38)).cast(LongType)
        val samp = base.filter(pmod(lcg, lit(64L)) === 0L)
        val wv = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
        val ranked = samp.withColumn("r", row_number().over(wv).cast(LongType))
        val ns = samp.groupBy($"event_type").agg(count(lit(1)).as("sample_n"))
        val n = base.groupBy($"event_type").agg(count(lit(1)).as("n"))
        val picked = ranked.join(ns, "event_type")
        val p50 = picked.filter($"r" === idiv($"sample_n" + lit(1L), lit(2L)))
          .select($"event_type", $"value".as("p50"))
        val p95 = picked.filter($"r" ===
            idiv($"sample_n" * lit(95L) + lit(99L), lit(100L)))
          .select($"event_type", $"value".as("p95"))
        // loud small-group guard (ADVICE r14): a group whose 1/64 sample is
        // EMPTY would vanish through the inner joins on both engines — the
        // oracle cannot catch a silent disappearance both sides share, so
        // the engine refuses instead: groups under ~64 rows need the exact
        // path (event_value_quantiles), not a sample-rank summary
        val unsampled = n.join(ns, Seq("event_type"), "left_anti")
          .select($"event_type").collect().map(_.getString(0))
        require(unsampled.isEmpty,
          s"quantile sample empty for group(s) ${unsampled.mkString(",")} — " +
            "use the exact quantile path for sub-sample-rate groups")
        n.join(ns, "event_type").join(p50, "event_type").join(p95, "event_type")
          .select($"event_type", $"p50", $"p95", $"n", $"sample_n")
          .orderBy($"event_type")
      },
      Some(s"""WITH s AS (SELECT event_type, value, event_id FROM events
          WHERE CAST(($SkA * CAST(event_id AS HUGEINT) + $SkC)
            % $SkMod AS BIGINT) % 64 = 0),
        r AS (SELECT event_type, value, event_id,
            row_number() OVER (PARTITION BY event_type
              ORDER BY value, event_id) AS r FROM s),
        ns AS (SELECT event_type, COUNT(*) AS sample_n FROM s GROUP BY 1),
        n AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
        SELECT n.event_type, p50.value AS p50, p95.value AS p95, n.n, ns.sample_n
        FROM n JOIN ns USING (event_type)
        JOIN r p50 ON p50.event_type = n.event_type
          AND p50.r = (ns.sample_n + 1) // 2
        JOIN r p95 ON p95.event_type = n.event_type
          AND p95.r = (95 * ns.sample_n + 99) // 100
        ORDER BY event_type"""),
      "Approximate per-group quantiles — the REPLAYABLE mergeable-summary " +
        "twin as the standing oracle (deterministic LCG 1/64 row sample + " +
        "exact lower-quantile ranks; GK summaries are insertion-order-" +
        "dependent and cannot be cross-engine-replayed); the GK " +
        "approx_percentile path stays rank-error-bounded in ApproxSpec."),

    "range_join_bucketed" -> Q(
      (s, d) => {
        import s.implicits._
        // The scale path for q19's shape when the interval side is itself a
        // fact table (here: one validity interval per order, 15k..15M rows —
        // far past broadcast-NL territory). Grid-bucketed equi-join; the
        // exact band result, no cartesian anywhere (PlanAuditSpec).
        // Interval bounds are exact small-integer doubles, so the residual
        // comparison is engine-portable.
        val ev = eventsTable(s, d)
          .filter($"event_type" === "purchase")
          .select($"event_id", $"value")
        val iv = table(s, d, "orders")
          .select($"o_orderkey", $"o_orderpriority",
            (($"o_orderkey" % 97).cast("double") * 5.0).as("lo"))
          .withColumn("hi", $"lo" + ($"o_orderkey" % 7 + 1).cast("double"))
        graft.operators.RangeJoin
          .pointInInterval(ev, iv, "value", "lo", "hi", bucketWidth = 8.0)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_pairs"),
            sum($"event_id").cast("long").as("sum_event_id"),
            countDistinct($"event_id").as("n_events"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_pairs,
        CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events
        FROM (SELECT event_id, value FROM events WHERE event_type = 'purchase') e
        JOIN (SELECT o_orderpriority,
                CAST((o_orderkey % 97) * 5.0 AS DOUBLE) AS lo,
                CAST((o_orderkey % 97) * 5.0 + (o_orderkey % 7 + 1) AS DOUBLE) AS hi
              FROM orders) i
          ON e.value >= i.lo AND e.value < i.hi
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "Grid-bucketed interval join: large interval table joined by cell equi-key " +
        "+ residual predicate (the 100 TB path where q19's broadcast-NL breaks)"),

    "grouped_topk" -> Q(
      (s, d) => {
        // Bounded-state per-group top-K: the TopKPairs aggregate (O(k)
        // heap, map-side partial aggregation) instead of a row_number()
        // window. Spark 4's WindowGroupLimit bounds the window form too
        // (SPARK-37099); the aggregate still shuffles k x fewer records
        // (one O(k) state vs k rows per map-partition group — measured in
        // tools.TopKBench) and composes with other aggregates in one pass.
        // The decimal-scaled priority is exact and monotone, so the BIGINT
        // rank order equals the double value order.
        val pr = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))
          * 10000).cast("long")
        eventsTable(s, d)
          .select(col("event_type"), pr.as("p"), col("event_id").as("v"))
          .groupBy(col("event_type"))
          .agg(graft.functions.topk_pairs(col("p"), col("v"), 5,
            descending = true).as("tk"))
          .select(col("event_type"), explode(col("tk")).as("e"))
          .select(col("event_type"), col("e.v").as("event_id"),
            col("e.p").as("value_e4"))
          .orderBy(col("event_type"), desc("value_e4"), col("event_id"))
      },
      Some("""SELECT event_type, event_id, value_e4 FROM (
          SELECT event_type, event_id,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS value_e4,
            row_number() OVER (PARTITION BY event_type
              ORDER BY CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) DESC,
                event_id) AS rn
          FROM events) WHERE rn <= 5
        ORDER BY event_type, value_e4 DESC, event_id"""),
      "Per-group top-5 via the bounded-state native aggregate (O(k) heap, partial " +
        "aggregation before the exchange) vs the row_number window oracle."),

    "pareto_frontier" -> Q(
      (s, d) => {
        import s.implicits._
        // 2-D skyline over part: cheapest price for each quality (size)
        // level — the rows no other part beats on BOTH price and size.
        // operators.Skyline turns the O(N²) dominance check into one
        // distinct-x aggregation + a distributed strict-prefix max (the
        // PrefixSum two-job shape), so no unpartitioned window and no
        // self-join. Price in exact cents (BIGINT) on both engines.
        val p = table(s, d, "part").select($"p_partkey",
          $"p_size".cast("long").as("size"),
          round($"p_retailprice" * 100).cast("long").as("price_c"))
        graft.operators.Skyline.frontier2D(p, x = "price_c", y = "size")
          .orderBy($"price_c", $"size", $"p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
            CAST(round(p_retailprice * 100) AS BIGINT) AS price_c FROM part)
          SELECT p_partkey, size, price_c FROM p a
          WHERE NOT EXISTS (SELECT 1 FROM p b
            WHERE b.price_c <= a.price_c AND b.size >= a.size
              AND (b.price_c < a.price_c OR b.size > a.size))
          ORDER BY price_c, size, p_partkey"""),
      "2-D pareto frontier (min price, max size) via distributed prefix-max " +
        "skyline ≡ the O(N²) NOT EXISTS dominance oracle."),

    "event_transition_matrix" -> Q(
      (s, d) => {
        import s.implicits._
        // First-order Markov transition counts over per-user event
        // sequences: lag() under a user-partitioned window (each user's
        // history is small — the window parallelizes across users), then
        // one count aggregation keyed by the (prev, curr) pair.
        val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
        eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("tsu"), $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type", $"event_type")
          .agg(count(lit(1)).as("n_transitions"))
          .orderBy($"prev_type", $"event_type")
      },
      Some("""WITH seq AS (
          SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type, count(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type ORDER BY prev_type, event_type"""),
      "First-order Markov transition matrix of per-user event sequences " +
        "(user-partitioned lag + one pair-keyed count)."),

    "markov_stationary" -> Q(
      (s, d) => {
        import s.implicits._
        // Steady state of the event-type Markov chain — what
        // event_transition_matrix's one-step probabilities converge to: 4
        // power-iteration rounds from uniform in the PageRank
        // scaled-integer discipline (v·c_ij DIV c_i contributions, integer
        // sums order-independent → bit-exact vs the unrolled replay). The
        // chain is O(types²) — every join here is broadcast-size — but the
        // COUNT table comes from the full corpus scan, which is the
        // distributed part; iterate cost is independent of corpus size.
        val scale = 1000000000000L
        val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
        val c = eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("tsu"), $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type".as("i"), $"event_type".as("j"))
          .agg(count(lit(1)).as("cij"))
        val ci = c.groupBy($"i").agg(sum($"cij").as("ci"))
        val states = c.select($"i".as("state")).unionByName(c.select($"j".as("state"))).distinct()
        val n = states.count()
        // v is scaled to 1e12, so v*cij overflows BIGINT once any transition
        // count exceeds ~9.2e6 — route the product through DECIMAL(38,0)
        // (same scale*count discipline as Hits/t_closeness/vwap_bars); the
        // DIV result is back under 1e12 so the running value stays BIGINT.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        var v = states.select($"state", lit(scale / n).as("v"))
        for (_ <- 1 to 4) {
          v = c.join(ci, "i")
            .join(v.select($"state".as("i"), $"v"), "i")
            .select($"j".as("state"),
              idiv($"v".cast(d38) * $"cij".cast(d38), $"ci".cast(d38))
                .cast("long").as("contrib"))
            .groupBy($"state").agg(sum($"contrib").as("v"))
        }
        v.select($"state", $"v".as("pi_scaled")).orderBy($"state")
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
          FROM events),
        c AS (SELECT prev_type AS i, event_type AS j, count(*) AS cij
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        ci AS (SELECT i, CAST(sum(cij) AS BIGINT) AS ci FROM c GROUP BY 1),
        st AS (SELECT i AS state FROM c UNION SELECT j FROM c),
        nn AS (SELECT count(*) AS n FROM st),
        v0 AS (SELECT state, 1000000000000 // (SELECT n FROM nn) AS v FROM st),
        v1 AS (SELECT c.j AS state, CAST(sum((CAST(v0.v AS HUGEINT) * c.cij) // ci.ci) AS BIGINT) AS v
          FROM c JOIN ci ON c.i = ci.i JOIN v0 ON v0.state = c.i GROUP BY 1),
        v2 AS (SELECT c.j AS state, CAST(sum((CAST(v1.v AS HUGEINT) * c.cij) // ci.ci) AS BIGINT) AS v
          FROM c JOIN ci ON c.i = ci.i JOIN v1 ON v1.state = c.i GROUP BY 1),
        v3 AS (SELECT c.j AS state, CAST(sum((CAST(v2.v AS HUGEINT) * c.cij) // ci.ci) AS BIGINT) AS v
          FROM c JOIN ci ON c.i = ci.i JOIN v2 ON v2.state = c.i GROUP BY 1),
        v4 AS (SELECT c.j AS state, CAST(sum((CAST(v3.v AS HUGEINT) * c.cij) // ci.ci) AS BIGINT) AS v
          FROM c JOIN ci ON c.i = ci.i JOIN v3 ON v3.state = c.i GROUP BY 1)
        SELECT state, v AS pi_scaled FROM v4 ORDER BY state"""),
      "Markov steady state of the event-type chain: 4 scaled-integer power " +
        "iterations (v·c_ij div c_i, bit-exact vs the unrolled replay); the " +
        "corpus-sized work is the one transition-count scan, the iterate is " +
        "O(types²) broadcast joins."),

    "decayed_rolling_sum" -> Q(
      (s, d) => {
        import s.implicits._
        // Exponentially-decayed engagement score per event: the last 4
        // event values of the same user, weighted 8/4/2/1 (α = 1/2
        // truncated at 4 taps). Values are scaled to exact integer cents
        // first, so the weighted sum is pure BIGINT arithmetic — order-
        // independent and bit-equal on both engines (a double EWMA would
        // drift with reduction order). The window partitions by user, so
        // it parallelizes; a true infinite-horizon EWMA is inherently
        // sequential and would need the PrefixSum two-pass instead.
        val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
        val v = round($"value" * 100).cast("long")
        eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("tsu"), v.as("v_c"))
          .withColumn("decayed_c",
            $"v_c" * 8 + coalesce(lag($"v_c", 1).over(w), lit(0L)) * 4
              + coalesce(lag($"v_c", 2).over(w), lit(0L)) * 2
              + coalesce(lag($"v_c", 3).over(w), lit(0L)))
          .select($"user_id", $"event_id", $"tsu", $"decayed_c")
          .orderBy($"user_id", $"tsu", $"event_id")
      },
      Some("""WITH base AS (
          SELECT user_id, event_id, epoch_us(ts) AS tsu,
            CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
        lagged AS (
          SELECT user_id, event_id, tsu,
            v_c * 8 + coalesce(lag(v_c, 1) OVER w, 0) * 4
              + coalesce(lag(v_c, 2) OVER w, 0) * 2
              + coalesce(lag(v_c, 3) OVER w, 0) AS decayed_c
          FROM base WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id))
        SELECT user_id, event_id, tsu, decayed_c FROM lagged
        ORDER BY user_id, tsu, event_id"""),
      "Exponentially-decayed rolling engagement score (weights 8/4/2/1) in exact " +
        "scaled-integer arithmetic — the deterministic EWMA-truncation."),

    "co_occurrence_pairs" -> Q(
      (s, d) => {
        import s.implicits._
        // Market-basket co-occurrence: the 50 part pairs most often ordered
        // together. The self-join fans out per order by basket size — a
        // BOUNDED constant (TPC-H ≤ 7 line items/order), so pair rows are
        // O(rows × basket), not O(N²); the top-50 runs as
        // TakeOrderedAndProject (no global sort materializes).
        val op = table(s, d, "lineitem")
          .select($"l_orderkey", $"l_partkey").distinct()
        op.as("a").join(op.as("b"),
            $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
          .groupBy($"a.l_partkey".as("part_a"), $"b.l_partkey".as("part_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(desc("n_orders"), $"part_a", $"part_b")
          .limit(50)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 50"""),
      "Top-50 market-basket co-occurrence pairs: bounded per-basket fan-out " +
        "self-join, pair-keyed count, TakeOrderedAndProject top-k."),

    "interval_max_concurrency" -> Q(
      (s, d) => {
        import s.implicits._
        // Peak interval concurrency (the "maximum rooms" problem): how many
        // orders are simultaneously open, and when the peak is first hit.
        // Each interval emits a +1 at its start and a −1 at its (exclusive)
        // end; the answer is the max of the running sum over ONE global
        // total order — inherently sequential, so the scan runs through
        // PrefixSum's two-job distributed pass (range-partitioned, driver
        // holds O(partitions) offsets) instead of an unpartitioned window
        // that would pull every endpoint through a single task. Interval
        // lengths derive deterministically from the key; all arithmetic is
        // integer microseconds.
        val dayUs = 86400000000L
        val o = table(s, d, "orders").select($"o_orderkey",
          micros($"o_orderdate").as("start_us"),
          (micros($"o_orderdate") + ($"o_orderkey" % 28 + 1) * dayUs).as("end_us"))
        val pts = o.select($"start_us".as("t_us"), lit(1L).as("delta"), $"o_orderkey")
          .unionByName(o.select($"end_us".as("t_us"), lit(-1L).as("delta"), $"o_orderkey"))
        val running = graft.operators.PrefixSum.groupedRunningTotal(
          pts, group = Seq.empty, order = Seq($"t_us", $"delta", $"o_orderkey"),
          value = "delta", out = "open_now")
        running.join(broadcast(running.agg(max($"open_now").as("peak"))),
            $"open_now" === $"peak")
          .agg(max($"peak").as("peak_concurrency"), min($"t_us").as("first_peak_us"))
      },
      Some("""WITH o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS start_us,
            epoch_us(o_orderdate) + (o_orderkey % 28 + 1) * 86400000000 AS end_us
          FROM orders),
        pts AS (
          SELECT start_us AS t_us, 1 AS delta, o_orderkey FROM o
          UNION ALL SELECT end_us, -1, o_orderkey FROM o),
        running AS (
          SELECT t_us, CAST(SUM(delta) OVER (ORDER BY t_us, delta, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_now
          FROM pts)
        SELECT max(peak) AS peak_concurrency, min(t_us) AS first_peak_us
        FROM running, (SELECT max(open_now) AS peak FROM running)
        WHERE open_now = peak"""),
      "Peak interval concurrency (+1/−1 endpoint scan) via the distributed " +
        "PrefixSum pass — no single-task global window."),

    "q12c_grouping_sets" -> Q(
      (s, d) => {
        import s.implicits._
        // Explicit GROUPING SETS (the general form rollup/cube specialize):
        // per-returnflag totals, per-linestatus totals, and the grand total
        // in ONE scan — Catalyst expands to a single Expand + aggregation,
        // not three scans unioned. grouping_id() disambiguates the NULLs of
        // each set on both engines.
        table(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT l_returnflag, l_linestatus,
            CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_qty_e4
          FROM lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY gid, l_returnflag, l_linestatus""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
          count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT) AS sum_qty_e4
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus"""),
      "Explicit GROUPING SETS: three aggregation grains in one Expand+agg scan, " +
        "grouping_id-disambiguated."),

    "robust_stats_mad" -> Q(
      (s, d) => {
        import s.implicits._
        // Robust per-group dispersion: median + MAD (median absolute
        // deviation) — the outlier-resistant alternative to mean/stddev for
        // quality gates. Two exact-percentile passes over integer cents
        // (interpolated identically on both engines: the only doubles are
        // midpoints of exact integers); the per-group median is broadcast
        // back for the deviation pass, so each pass is one partial-agg
        // shuffle keyed by the group.
        val v = round($"value" * 100).cast("long")
        val base = eventsTable(s, d).select($"event_type", v.as("v_c"))
        val med = base.groupBy($"event_type")
          .agg(percentile($"v_c", lit(0.5)).as("med_c"))
        base.join(broadcast(med), "event_type")
          .withColumn("adev", abs($"v_c" - $"med_c"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), max($"med_c").as("median_c"),
            percentile($"adev", lit(0.5)).as("mad_c"))
          .orderBy($"event_type")
      },
      Some("""WITH base AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
          med AS (SELECT event_type, median(v_c) AS med_c FROM base GROUP BY event_type)
        SELECT event_type, count(*) AS n, max(med_c) AS median_c,
          median(abs(v_c - med_c)) AS mad_c
        FROM base JOIN med USING (event_type)
        GROUP BY event_type ORDER BY event_type"""),
      "Per-group median + MAD (outlier-robust dispersion) in two exact-percentile " +
        "passes over integer cents; group medians broadcast for the deviation pass."),

    "window_functions_suite" -> Q(
      (s, d) => {
        import s.implicits._
        // The remaining ranking/distribution window surface in one plan:
        // ntile quartiles, cume_dist, nth_value and lead over the same
        // event_type-partitioned total order. Because the order is shared,
        // Catalyst runs them over ONE exchange + shared sort (asserted in
        // PlanAuditSpec; the running-frame nth_value chains a second Window
        // op but re-uses the same partitioning and order) — the property
        // that matters at scale. cume_dist is the single int/int division;
        // everything else is integer-exact. The order ties break on
        // event_id, so every function is deterministic.
        val pr = ($"value".cast(DecimalType(18, 4)) * 10000).cast("long")
        val w = Window.partitionBy($"event_type").orderBy($"value_e4", $"event_id")
        eventsTable(s, d)
          .filter($"user_id" % 50 === 0)
          .select($"event_type", $"event_id", pr.as("value_e4"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("cdist", cume_dist().over(w))
          .withColumn("second_lowest", nth_value($"value_e4", 2)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next_value", lead($"value_e4", 1).over(w))
          .orderBy($"event_type", $"value_e4", $"event_id")
      },
      Some("""SELECT event_type, event_id,
          CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS value_e4,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          cume_dist() OVER w AS cdist,
          nth_value(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT), 2)
            OVER (PARTITION BY event_type
              ORDER BY CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_lowest,
          lead(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT), 1) OVER w AS next_value
        FROM events WHERE user_id % 50 = 0
        WINDOW w AS (PARTITION BY event_type
          ORDER BY CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT), event_id)
        ORDER BY event_type, value_e4, event_id"""),
      "ntile/cume_dist/nth_value/lead fused into one Window over one exchange+sort " +
        "(shared order) — the ranking/distribution window surface, deterministic ties."),

    "interval_overlap_join" -> Q(
      (s, d) => {
        import s.implicits._
        // Interval×interval overlap join at fact×fact scale: which pairs of
        // a customer's orders were open simultaneously. A raw OR-free
        // non-equi join (aLo < bHi && bLo < aHi) would go nested-loop;
        // RangeJoin.intervalOverlap grids both sides and keeps each pair
        // only in its reference cell — an equi-join on (custkey, cell) with
        // ZERO post-join dedup. Interval lengths derive deterministically
        // from the key (as in interval_max_concurrency). Grid width = 28d =
        // the MAX interval length, so every interval spans ≤ 2 cells
        // (replication ≤ 2× per side) — the r13 width sweep (ScaleBench
        // interval_overlap_ab: 3.5d 1.33s / 7d 0.87s / 14d 0.64s / 28d
        // 0.53s min-of-3 at sf0.1) showed the prior 7d cells paid ~4×
        // replication for no density win because the join key already
        // includes custkey (per-bucket candidate sets stay tiny).
        val dayUs = 86400000000L
        val o = table(s, d, "orders").select($"o_orderkey", $"o_custkey",
          micros($"o_orderdate").as("start_us"),
          (micros($"o_orderdate") + ($"o_orderkey" % 28 + 1) * dayUs).as("end_us"))
        val a = o.select($"o_custkey", $"o_orderkey".as("ok_a"),
          $"start_us".as("alo"), $"end_us".as("ahi"))
        val b = o.select($"o_custkey", $"o_orderkey".as("ok_b"),
          $"start_us".as("blo"), $"end_us".as("bhi"))
        graft.operators.RangeJoin.intervalOverlap(a, b,
            "alo", "ahi", "blo", "bhi",
            bucketWidth = 28.0 * dayUs, keys = Seq("o_custkey"))
          .filter($"ok_a" < $"ok_b")
          .select($"o_custkey", $"ok_a", $"ok_b",
            (least($"ahi", $"bhi") - greatest($"alo", $"blo")).as("overlap_us"))
          .orderBy($"o_custkey", $"ok_a", $"ok_b")
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS start_us,
            epoch_us(o_orderdate) + (o_orderkey % 28 + 1) * 86400000000 AS end_us
          FROM orders)
        SELECT a.o_custkey, a.o_orderkey AS ok_a, b.o_orderkey AS ok_b,
          least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) AS overlap_us
        FROM o a JOIN o b ON a.o_custkey = b.o_custkey
          AND a.o_orderkey < b.o_orderkey
          AND a.start_us < b.end_us AND b.start_us < a.end_us
        ORDER BY a.o_custkey, ok_a, ok_b"""),
      "Interval×interval overlap join via grid cells + reference-cell dedup " +
        "(each pair meets exactly once, no distinct) — fact×fact, no nested loop."),

    "hierarchy_closure" -> Q(
      (s, d) => {
        import s.implicits._
        // Hierarchical (CONNECT BY / recursive-CTE) traversal: the ancestor
        // closure of a part hierarchy to depth 3, as iterative equi-joins —
        // each hop is one keyed shuffle, state is the frontier only, the
        // same shape that scales PageRank/connected-components to 1000
        // executors. The hierarchy derives deterministically from the key
        // (parent = id div 7, root when that hits 0); the oracle unrolls
        // the identical three hops as chained CTEs.
        val e = table(s, d, "part")
          .select($"p_partkey".cast("long").as("id"),
            expr("p_partkey div 7").cast("long").as("pid"))
          .filter($"pid" >= 1)
        var lvl = e.select($"id", $"pid".as("anc"), lit(1L).as("depth"))
        var out = lvl
        for (k <- 2 to 3) {
          lvl = lvl.join(e.select($"id".as("anc"), $"pid".as("anc2")), "anc")
            .select($"id", $"anc2".as("anc"), lit(k.toLong).as("depth"))
          out = out.unionByName(lvl)
        }
        out.orderBy($"id", $"depth")
      },
      Some("""WITH e AS (SELECT CAST(p_partkey AS BIGINT) AS id,
            CAST(p_partkey // 7 AS BIGINT) AS pid FROM part WHERE p_partkey // 7 >= 1),
          l1 AS (SELECT id, pid AS anc, 1 AS depth FROM e),
          l2 AS (SELECT l1.id, e.pid AS anc, 2 AS depth FROM l1 JOIN e ON l1.anc = e.id),
          l3 AS (SELECT l2.id, e.pid AS anc, 3 AS depth FROM l2 JOIN e ON l2.anc = e.id)
        SELECT id, anc, CAST(depth AS BIGINT) AS depth
        FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
        ORDER BY id, depth"""),
      "Ancestor closure to depth 3 (CONNECT BY surface) as iterative frontier " +
        "joins — one keyed shuffle per hop, ≡ the unrolled recursive-CTE oracle."),

    "hierarchy_closure_full" -> Q(
      (s, d) => {
        import s.implicits._
        // The UNBOUNDED variant of hierarchy_closure: frontier iteration to
        // convergence (operators.Closure), oracle = a TRUE recursive CTE
        // run to its fixpoint — no depth constant on either side. The part
        // hierarchy (parent = id div 7) is ~log_7(n) deep, so the depth
        // grows with the scale factor and a hardcoded unroll would
        // silently truncate at 10x data: exactly the case the
        // to-convergence loop exists for.
        val e = table(s, d, "part")
          .select($"p_partkey".cast("long").as("id"),
            expr("p_partkey div 7").cast("long").as("pid"))
          .filter($"pid" >= 1)
        graft.operators.Closure.ancestors(e)
      },
      Some("""WITH RECURSIVE e AS (SELECT CAST(p_partkey AS BIGINT) AS id,
            CAST(p_partkey // 7 AS BIGINT) AS pid FROM part WHERE p_partkey // 7 >= 1),
          r(id, anc, depth) AS (
            SELECT id, pid, CAST(1 AS BIGINT) FROM e
            UNION ALL
            SELECT r.id, e.pid, r.depth + 1 FROM r JOIN e ON r.anc = e.id)
        SELECT id, anc, depth FROM r ORDER BY id, depth, anc"""),
      "Ancestor closure to CONVERGENCE (arbitrary-depth recursive CTE): " +
        "frontier joins until empty, emptiness-probe termination — vs " +
        "DuckDB's native WITH RECURSIVE fixpoint."),

    "date_parts_suite" -> Q(
      (s, d) => {
        import s.implicits._
        // Calendar-part semantics across engines — the classic parity trap:
        // Spark's dayofweek() is 1=Sunday while DuckDB's isodow is
        // 1=Monday, so the engine side normalizes to ISO ((dow+5)%7+1);
        // weekofyear/dayofyear/quarter already agree on ISO semantics.
        // Aggregated per (year, month) so every part function is exercised
        // over every row but the output stays compact.
        val dt = $"o_orderdate"
        table(s, d, "orders")
          .select(year(dt).cast("long").as("y"), month(dt).cast("long").as("m"),
            quarter(dt).cast("long").as("q"),
            ((dayofweek(dt) + 5) % 7 + 1).cast("long").as("iso_dow"),
            weekofyear(dt).cast("long").as("iso_week"),
            dayofyear(dt).cast("long").as("doy"),
            dayofmonth(dt).cast("long").as("dom"))
          .groupBy($"y", $"m")
          .agg(count(lit(1)).as("n"), max($"q").as("q"),
            sum($"iso_dow").as("sum_iso_dow"), sum($"iso_week").as("sum_iso_week"),
            sum($"doy").as("sum_doy"), sum($"dom").as("sum_dom"))
          .orderBy($"y", $"m")
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
          CAST(month(o_orderdate) AS BIGINT) AS m, count(*) AS n,
          CAST(max(quarter(o_orderdate)) AS BIGINT) AS q,
          CAST(sum(isodow(o_orderdate)) AS BIGINT) AS sum_iso_dow,
          CAST(sum(weekofyear(o_orderdate)) AS BIGINT) AS sum_iso_week,
          CAST(sum(dayofyear(o_orderdate)) AS BIGINT) AS sum_doy,
          CAST(sum(day(o_orderdate)) AS BIGINT) AS sum_dom
        FROM orders GROUP BY 1, 2 ORDER BY y, m"""),
      "Calendar-part parity suite (year/quarter/month/ISO week/ISO dow/doy/dom): " +
        "engine-side dayofweek normalized to ISO; every part checked over every row."),

    "attribution_last_touch" -> Q(
      (s, d) => {
        import s.implicits._
        // Last-touch attribution: every purchase credits the latest click
        // by the same user within a 7-day lookback, else counts as organic.
        // Routed through the NATIVE as-of with the 7-day tolerance IN the
        // merge loop (r8): the stale-click case comes back as a NULL
        // payload directly — no post-window predicate, no padded union
        // frame. One streamed merge, one rollup. The attribution output is
        // per-user: attributed/organic purchase counts and revenue in
        // exact cents.
        val tolUs = 7L * 86400000000L
        val ev = eventsTable(s, d)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", micros($"ts").as("tsu"),
            round($"value" * 100).cast("long").as("rev_c"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), micros($"ts").as("ctsu"),
            micros($"ts").as("click_ts"), $"event_id".as("click_id"))
        AsOfJoin.leftAsOfNative(purchases, clicks, "user_id", "c_user", "tsu", "ctsu",
            Seq("click_id", "click_ts"), toleranceUs = Some(tolUs))
          .withColumn("attributed", $"click_id".isNotNull)
          .groupBy($"user_id")
          .agg(
            sum(when($"attributed", 1L).otherwise(0L)).as("n_attributed"),
            sum(when(!$"attributed", 1L).otherwise(0L)).as("n_organic"),
            sum(when($"attributed", $"rev_c").otherwise(0L)).as("attributed_rev_c"),
            sum(when(!$"attributed", $"rev_c").otherwise(0L)).as("organic_rev_c"))
          .orderBy($"user_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
            CAST(round(value * 100) AS BIGINT) AS rev_c
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, epoch_us(ts) AS ctsu, event_id AS click_id
          FROM events WHERE event_type = 'click'),
        j AS (SELECT p.*, c.ctsu,
            (c.click_id IS NOT NULL AND p.tsu - c.ctsu <= 604800000000) AS attributed
          FROM p ASOF LEFT JOIN c ON p.user_id = c.c_user AND p.tsu >= c.ctsu)
        SELECT user_id,
          CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
          CAST(sum(CASE WHEN attributed THEN 0 ELSE 1 END) AS BIGINT) AS n_organic,
          CAST(sum(CASE WHEN attributed THEN rev_c ELSE 0 END) AS BIGINT) AS attributed_rev_c,
          CAST(sum(CASE WHEN attributed THEN 0 ELSE rev_c END) AS BIGINT) AS organic_rev_c
        FROM j GROUP BY user_id ORDER BY user_id"""),
      "Last-touch attribution with a 7-day lookback (AsOfJoin + tolerance + rollup): " +
        "attributed vs organic purchase counts and revenue per user, exact cents."),

    "attribution_position_based" -> Q(
      (s, d) => {
        import s.implicits._
        // MULTI-TOUCH position-based (U-shaped) attribution — the
        // whole-path companion to attribution_last_touch: every click by
        // the same user in the purchase's 7-day lookback is a touch, and
        // the revenue splits first 40% / last 40% / middles share 20%
        // (n=1 → 100%, n=2 → 50/50). MONEY-EXACT by construction: each
        // non-final touch takes floor(rev·w/10000) basis-point cents and
        // the FINAL touch takes the remainder, so per-purchase credits sum
        // to rev_c exactly — no lost cents, mirrored floor-for-floor by
        // the oracle. Shape: one per-user range join (touch paths), two
        // windows over O(path) rows, one rollup; never a global window.
        val look = 7L * 86400000000L
        val ev = eventsTable(s, d)
        val p = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id", micros($"ts").as("ptsu"),
            round($"value" * 100).cast("long").as("rev_c"))
        val c = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), micros($"ts").as("ctsu"))
        val touches = p.join(c, Seq("user_id"))
          .filter($"ctsu" < $"ptsu" && $"ctsu" >= $"ptsu" - look)
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy($"p_id").orderBy($"ctsu", $"click_id")
        val withPos = touches
          .withColumn("pos", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"p_id")))
        val bp = when($"n" === 1, lit(10000L))
          .when($"n" === 2, lit(5000L))
          .when($"pos" === 1 || $"pos" === $"n", lit(4000L))
          .otherwise(idiv(lit(2000L), $"n" - 2))
        val withFloor = withPos.withColumn("floor_c", idiv($"rev_c" * bp, lit(10000L)))
        val wSum = org.apache.spark.sql.expressions.Window.partitionBy($"p_id")
        val credited = withFloor
          .withColumn("others_c", sum(when($"pos" === $"n", 0L).otherwise($"floor_c")).over(wSum))
          .withColumn("credit_c",
            when($"pos" === $"n", $"rev_c" - $"others_c").otherwise($"floor_c"))
        credited.groupBy($"user_id")
          .agg(countDistinct($"p_id").as("n_purchases"),
            count(lit(1)).as("n_touches"),
            sum($"credit_c").as("credited_rev_c"))
          .orderBy($"user_id")
      },
      Some("""WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS ptsu,
            CAST(round(value * 100) AS BIGINT) AS rev_c
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS ctsu
          FROM events WHERE event_type = 'click'),
        t AS (SELECT p.*, c.click_id, c.ctsu FROM p JOIN c USING (user_id)
          WHERE c.ctsu < p.ptsu AND c.ctsu >= p.ptsu - 604800000000),
        pos AS (SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY ctsu, click_id) AS pos,
            count(*) OVER (PARTITION BY p_id) AS n FROM t),
        fl AS (SELECT *, rev_c * (CASE WHEN n = 1 THEN 10000 WHEN n = 2 THEN 5000
            WHEN pos = 1 OR pos = n THEN 4000 ELSE 2000 // (n - 2) END) // 10000 AS floor_c
          FROM pos),
        cr AS (SELECT *, CASE WHEN pos = n THEN rev_c -
            sum(CASE WHEN pos = n THEN 0 ELSE floor_c END) OVER (PARTITION BY p_id)
          ELSE floor_c END AS credit_c FROM fl)
        SELECT user_id, count(DISTINCT p_id) AS n_purchases,
          count(*) AS n_touches, CAST(sum(credit_c) AS BIGINT) AS credited_rev_c
        FROM cr GROUP BY user_id ORDER BY user_id"""),
      "Position-based (U-shaped) multi-touch attribution: 40/20/40 basis-point " +
        "splits over each purchase's 7-day touch path, final touch takes the " +
        "floor remainder so per-purchase credits sum to the revenue exactly."),

    "attribution_linear" -> Q(
      (s, d) => {
        import s.implicits._
        // LINEAR multi-touch attribution — the equal-split member
        // completing the model ladder (last-touch → position-based →
        // linear → Markov removal-effect → Shapley): every click in the
        // purchase's 7-day lookback takes floor(rev/n) cents and the FINAL
        // touch takes the remainder, so per-purchase credits sum to rev_c
        // exactly (the position-based money discipline). Same
        // touch-path build: one per-user range join, one count window.
        val look = 7L * 86400000000L
        val ev = eventsTable(s, d)
        val p = ev.filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id", micros($"ts").as("ptsu"),
            round($"value" * 100).cast("long").as("rev_c"))
        val c = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"), micros($"ts").as("ctsu"))
        val touches = p.join(c, Seq("user_id"))
          .filter($"ctsu" < $"ptsu" && $"ctsu" >= $"ptsu" - look)
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy($"p_id").orderBy($"ctsu", $"click_id")
        val withPos = touches
          .withColumn("pos", row_number().over(wOrd).cast("long"))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"p_id")))
          .withColumn("floor_c", idiv($"rev_c", $"n"))
          .withColumn("credit_c",
            when($"pos" === $"n", $"rev_c" - ($"n" - 1) * idiv($"rev_c", $"n"))
              .otherwise(idiv($"rev_c", $"n")))
        withPos.groupBy($"user_id")
          .agg(countDistinct($"p_id").as("n_purchases"),
            count(lit(1)).as("n_touches"),
            sum($"credit_c").as("credited_rev_c"))
          .orderBy($"user_id")
      },
      Some("""WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS ptsu,
            CAST(round(value * 100) AS BIGINT) AS rev_c
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS ctsu
          FROM events WHERE event_type = 'click'),
        t AS (SELECT p.*, c.click_id, c.ctsu FROM p JOIN c USING (user_id)
          WHERE c.ctsu < p.ptsu AND c.ctsu >= p.ptsu - 604800000000),
        pos AS (SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY ctsu, click_id) AS pos,
            count(*) OVER (PARTITION BY p_id) AS n FROM t),
        cr AS (SELECT *, CASE WHEN pos = n THEN rev_c - (n - 1) * (rev_c // n)
            ELSE rev_c // n END AS credit_c FROM pos)
        SELECT user_id, count(DISTINCT p_id) AS n_purchases,
          count(*) AS n_touches, CAST(sum(credit_c) AS BIGINT) AS credited_rev_c
        FROM cr GROUP BY user_id ORDER BY user_id"""),
      "Linear multi-touch attribution (equal split over the 7-day touch " +
        "path, final touch takes the floor remainder — per-purchase credits " +
        "sum to the revenue exactly), completing the attribution ladder."),

    "null_safe_join" -> Q(
      (s, d) => {
        import s.implicits._
        // NULL-safe equality join (<=> / IS NOT DISTINCT FROM) — the
        // semantic corner where `=` silently drops every NULL-keyed row:
        // deterministically NULL some keys on both sides, join null-safely,
        // and count matches per class. NULL<=>NULL rows pair up (here:
        // cross of the two NULL groups), which plain equality would lose
        // entirely; the side-by-side counts make the difference auditable.
        val o = table(s, d, "orders").select(
          when($"o_orderkey" % 100 === 7, lit(null)).otherwise($"o_custkey").as("k"),
          $"o_orderkey")
        val c = table(s, d, "customer").select(
          when($"c_custkey" % 50 === 7, lit(null)).otherwise($"c_custkey").as("ck"),
          $"c_custkey")
        val nullSafe = o.join(c, $"k" <=> $"ck")
          .agg(count(lit(1)).as("n"), lit("null_safe").as("semantics"))
        val plain = o.join(c, $"k" === $"ck")
          .agg(count(lit(1)).as("n"), lit("plain_equality").as("semantics"))
        nullSafe.unionByName(plain).select($"semantics", $"n").orderBy($"semantics")
      },
      Some("""WITH o AS (SELECT CASE WHEN o_orderkey % 100 = 7 THEN NULL
            ELSE o_custkey END AS k, o_orderkey FROM orders),
          c AS (SELECT CASE WHEN c_custkey % 50 = 7 THEN NULL
            ELSE c_custkey END AS ck, c_custkey FROM customer)
        SELECT 'null_safe' AS semantics, count(*) AS n FROM o JOIN c ON k IS NOT DISTINCT FROM ck
        UNION ALL SELECT 'plain_equality', count(*) FROM o JOIN c ON k = ck
        ORDER BY semantics"""),
      "NULL-safe equality join (<=> ≡ IS NOT DISTINCT FROM) vs plain equality, " +
        "side by side — the NULL-keyed rows plain `=` silently drops.")
    ,

    "grouped_regression" -> Q(
      (s, d) => {
        import s.implicits._
        // Per-group OLS (trend per event_type) the distributed way: ONE
        // aggregation pass computes the sufficient statistics (n, Σx, Σy,
        // Σxy, Σx²) with map-side partial aggregation — the 100 TB corpus
        // is touched once, the closed-form solve is O(groups). Emitted as
        // slope = slope_num/slope_den in EXACT integer arithmetic (x =
        // hours since 2024-01-01, y = cents): bit-identical across
        // engines, where a float covariance would differ by summation
        // order. Headroom: |n·Σxy| < 2^63 up to ~1e6 rows/group at these
        // magnitudes; past that, rescale x or widen to DECIMAL(38,0).
        val t0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400000000L
        val e = eventsTable(s, d).select($"event_type",
          expr(s"(unix_micros(cast(ts as timestamp)) - ${t0}L) div 3600000000").as("x"),
          round($"value" * 100).cast("long").as("y"))
        e.groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"x").as("sum_x"), sum($"y").as("sum_y"),
            sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
          .select($"event_type", $"n", $"sum_x", $"sum_y",
            ($"n" * $"sxy" - $"sum_x" * $"sum_y").as("slope_num"),
            ($"n" * $"sxx" - $"sum_x" * $"sum_x").as("slope_den"))
          .orderBy($"event_type")
      },
      Some("""WITH e AS (SELECT event_type,
            (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
            CAST(round(value * 100) AS BIGINT) AS y
          FROM events),
        a AS (SELECT event_type, count(*) AS n, sum(x) AS sum_x, sum(y) AS sum_y,
            sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM e GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n, CAST(sum_x AS BIGINT) AS sum_x,
          CAST(sum_y AS BIGINT) AS sum_y,
          CAST(n * sxy - sum_x * sum_y AS BIGINT) AS slope_num,
          CAST(n * sxx - sum_x * sum_x AS BIGINT) AS slope_den
        FROM a ORDER BY event_type"""),
      "Per-group OLS trend via sufficient statistics: one partial-aggregated " +
        "pass, O(groups) solve, exact integer slope ratio across engines.")
    ,

    "corr_matrix" -> Q(
      (s, d) => {
        import s.implicits._
        // Pairwise Pearson correlation matrix over the three bounded lineitem
        // measures, per return flag — the grouped_regression pattern widened
        // to every pair: ONE partial-aggregated pass computes the shared
        // sufficient statistics (n, Σx per measure, Σxy per pair), the
        // closed-form correlation components come out of an O(groups)
        // projection. Emitted as exact integer numerator/denominators
        // (corr² = num²/(den_x·den_y)) — bit-identical across engines where
        // a streaming float corr would differ by reduction order. Headroom:
        // measures ≤ 500 after scaling, so |n·Σxy| < 2^63 up to ~10⁹
        // rows/group; past that, center the measures or widen the three
        // products to DECIMAL(38,0) (same one-pass shape).
        val li = table(s, d, "lineitem").select($"l_returnflag",
          round($"l_quantity").cast("long").as("q"),
          round($"l_discount" * 100).cast("long").as("dd"),
          round($"l_tax" * 100).cast("long").as("tt"))
        val a = li.groupBy($"l_returnflag").agg(
          count(lit(1)).as("n"),
          sum($"q").as("sq"), sum($"dd").as("sd"), sum($"tt").as("st"),
          sum($"q" * $"q").as("sqq"), sum($"dd" * $"dd").as("sdd"),
          sum($"tt" * $"tt").as("stt"),
          sum($"q" * $"dd").as("sqd"), sum($"q" * $"tt").as("sqt"),
          sum($"dd" * $"tt").as("sdt"))
        // expand the three pairs FROM the single aggregated row (explode of
        // structs), never as a union of three selects over the aggregate — a
        // union re-plans the aggregate per branch (the plan audit counts the
        // scans: 6 with union, 1 here)
        def pairStruct(x: String, y: String, sx: String, sy: String, sxx: String,
            syy: String, sxy: String) =
          struct(lit(x).as("x_col"), lit(y).as("y_col"),
            (($"n" * col(sxy)) - (col(sx) * col(sy))).as("corr_num"),
            (($"n" * col(sxx)) - (col(sx) * col(sx))).as("den_x"),
            (($"n" * col(syy)) - (col(sy) * col(sy))).as("den_y"))
        a.select($"l_returnflag", $"n", explode(array(
            pairStruct("quantity", "discount", "sq", "sd", "sqq", "sdd", "sqd"),
            pairStruct("quantity", "tax", "sq", "st", "sqq", "stt", "sqt"),
            pairStruct("discount", "tax", "sd", "st", "sdd", "stt", "sdt"))).as("p"))
          .select($"l_returnflag", $"p.x_col", $"p.y_col", $"n",
            $"p.corr_num", $"p.den_x", $"p.den_y")
          .orderBy($"l_returnflag", $"x_col", $"y_col")
      },
      Some("""WITH li AS (SELECT l_returnflag,
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST(round(l_discount * 100) AS BIGINT) AS dd,
            CAST(round(l_tax * 100) AS BIGINT) AS tt
          FROM lineitem),
        a AS (SELECT l_returnflag, count(*) AS n,
            sum(q) AS sq, sum(dd) AS sd, sum(tt) AS st,
            sum(q*q) AS sqq, sum(dd*dd) AS sdd, sum(tt*tt) AS stt,
            sum(q*dd) AS sqd, sum(q*tt) AS sqt, sum(dd*tt) AS sdt
          FROM li GROUP BY 1)
        SELECT l_returnflag, x_col, y_col, CAST(n AS BIGINT) AS n,
          CAST(num AS BIGINT) AS corr_num,
          CAST(dx AS BIGINT) AS den_x, CAST(dy AS BIGINT) AS den_y
        FROM (
          SELECT l_returnflag, 'quantity' AS x_col, 'discount' AS y_col, n,
            n*sqd - sq*sd AS num, n*sqq - sq*sq AS dx, n*sdd - sd*sd AS dy FROM a
          UNION ALL
          SELECT l_returnflag, 'quantity', 'tax', n,
            n*sqt - sq*st, n*sqq - sq*sq, n*stt - st*st FROM a
          UNION ALL
          SELECT l_returnflag, 'discount', 'tax', n,
            n*sdt - sd*st, n*sdd - sd*sd, n*stt - st*st FROM a)
        ORDER BY l_returnflag, x_col, y_col"""),
      "Pairwise Pearson correlation matrix via shared sufficient statistics: one " +
        "aggregation pass for all pairs, exact integer corr components across engines."),

    "sliding_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        // Trailing-7-day distinct customers per order day. Spark windows
        // cannot COUNT(DISTINCT) over a range frame, and collect_set per day
        // is O(window·actors) state — the scale shape is the EXPANSION
        // trick: each distinct (day, customer) contributes itself to the 7
        // contribution days it can be visible in, dedup, count. Cost is a
        // bounded 7× row blowup of the DISTINCT day-customer pairs (already
        // aggregated, never raw orders), two hash shuffles, no per-group
        // state. Days are epoch-day integers; only days that exist as order
        // dates are emitted (inner join against the day dimension).
        val o = table(s, d, "orders").select(
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
          $"o_custkey")
        val dayCust = o.distinct()
        val contrib = dayCust
          .select(explode(sequence($"day", $"day" + 6)).as("d"), $"o_custkey")
          .distinct()
        val days = o.select($"day".as("d")).distinct()
        contrib.join(days, "d")
          .groupBy($"d")
          .agg(count(lit(1)).as("n_active_7d"))
          .orderBy($"d")
      },
      Some("""WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day, o_custkey
          FROM orders),
        dc AS (SELECT DISTINCT day, o_custkey FROM o),
        contrib AS (SELECT DISTINCT day + g AS d, o_custkey
          FROM dc, generate_series(0, 6) AS t(g)),
        days AS (SELECT DISTINCT day AS d FROM o)
        SELECT d, count(*) AS n_active_7d
        FROM contrib JOIN days USING (d)
        GROUP BY d ORDER BY d"""),
      "Trailing-7-day distinct actors per day via the window-expansion trick: " +
        "bounded 7x blowup of distinct (day, actor) pairs, no per-day set state, " +
        "no COUNT(DISTINCT) window."),

    "changepoint_cusum" -> Q(
      (s, d) => {
        import s.implicits._
        // Two-sided CUSUM over the daily order-revenue series, in exact
        // integer arithmetic. The textbook recurrence S_t = max(0, S_{t-1} +
        // x_t − k) is sequential; the distributed form is its closed
        // solution over prefix sums: S⁺_t = P_t − min(0, min_{j≤t} P_j) and
        // S⁻_t = max(0, max_{j≤t} P_j) − P_t with P = cumsum(x − k),
        // k = ⌊mean⌋ — running min/max of a prefix sum, both plain window
        // functions. The window is ordered over DAYS (the series is
        // pre-aggregated from raw orders first), so the single-partition
        // window holds O(days) rows no matter how many raw orders feed it —
        // at 100 TB the heavy reduction happened in the groupBy.
        val daily = table(s, d, "orders")
          .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
            round($"o_totalprice" * 100).cast("long").as("cents"))
          .groupBy($"day").agg(sum($"cents").as("rev"))
        val stats = daily.agg(sum($"rev").as("tot"), count(lit(1)).as("nd"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        daily.crossJoin(broadcast(stats))
          .withColumn("drift", $"rev" - expr("tot div nd"))
          .withColumn("p", sum($"drift").over(w))
          .withColumn("cusum_pos", $"p" - least(lit(0L), min($"p").over(w)))
          .withColumn("cusum_neg", greatest(lit(0L), max($"p").over(w)) - $"p")
          .select($"day", $"rev", $"cusum_pos", $"cusum_neg")
          .orderBy($"day")
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        st AS (SELECT CAST(sum(rev) AS BIGINT) AS tot, count(*) AS nd FROM daily),
        p AS (SELECT day, rev,
            CAST(sum(rev - (SELECT tot // nd FROM st)) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
          FROM daily)
        SELECT day, rev,
          p - least(0, CAST(min(p) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT)) AS cusum_pos,
          greatest(0, CAST(max(p) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS BIGINT)) - p AS cusum_neg
        FROM p ORDER BY day"""),
      "Two-sided integer CUSUM changepoint statistic: the sequential recurrence " +
        "solved as prefix-sum minus running-min — plain window functions over the " +
        "pre-aggregated daily series."),

    "approx_distinct_intersection" -> Q(
      (s, d) => {
        import s.implicits._
        // Bottom-k (KMV) sketches per event type, then pairwise
        // INTERSECTION cardinality estimates — the set operation HLL
        // (approx_distinct_by_group) cannot deliver: inclusion–exclusion
        // over HLL drowns small overlaps in the union's error, while the
        // KMV union sketch is computable exactly from the two sketches and
        // carries an unbiased Jaccard estimate (Beyer et al., SIGMOD'07).
        // Distribution: ONE pass — distinct (type, hash), then the
        // bounded-state k-min aggregate (TopKAgg, O(k) per group per
        // partition, map-side partial merge); the driver sees only
        // O(groups · k) longs and combines the 10 pairs.
        // FULL-ORACLE since r14 (VERDICT r13 #2): the replayable LCG hash
        // + the integer-exact Kmv estimators ((k−1)·M DIV kth;
        // nBoth·estU DIV |K|) make the whole pipeline — the PRODUCTION
        // shape, bounded-state agg + driver combine — DuckDB-replayable
        // bit-for-bit. The full-range xxhash64 + double-estimator path
        // stays as [[approxDistinctIntersectionNative]] (KmvSpec bounds).
        val K = 64
        val h = pmod($"user_id".cast(d38) * lit(SkA).cast(d38)
          + lit(SkC).cast(d38), lit(SkMod).cast(d38)).cast(LongType)
        val sk = eventsTable(s, d)
          .select($"event_type", h.as("h")).distinct()
          .groupBy($"event_type")
          .agg(graft.functions.topk_pairs($"h", $"h", K).as("tk"))
        val sketches = sk.collect()
          .map(r => r.getString(0) ->
            r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toArray.sorted)
          .sortBy(_._1)
        val rows = for {
          (ta, a) <- sketches.toSeq
          (tb, b) <- sketches.toSeq if ta < tb
        } yield {
          val u = graft.operators.Kmv.union(a, b, K)
          val (_, inter) = graft.operators.Kmv.intersectionInt(a, b, K, SkMod)
          (ta, tb,
            graft.operators.Kmv.estimateInt(a, K, SkMod),
            graft.operators.Kmv.estimateInt(b, K, SkMod),
            graft.operators.Kmv.estimateInt(u, K, SkMod),
            inter)
        }
        rows.toDF("type_a", "type_b", "est_a", "est_b", "est_union", "est_inter")
          .orderBy($"type_a", $"type_b")
      },
      Some(s"""WITH hs AS (SELECT DISTINCT event_type AS t,
            CAST(($SkA * CAST(user_id AS HUGEINT) + $SkC)
              % $SkMod AS BIGINT) AS h FROM events),
        sk AS (SELECT t, h FROM (
            SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS r
            FROM hs) WHERE r <= 64),
        ska AS (SELECT t, COUNT(*) AS kn, MAX(h) AS kth FROM sk GROUP BY 1),
        tt AS (SELECT DISTINCT t FROM sk),
        tp AS (SELECT a.t AS ta, b.t AS tb FROM tt a JOIN tt b ON a.t < b.t),
        mh AS (SELECT DISTINCT ta, tb, h FROM (
            SELECT tp.ta, tp.tb, sk.h FROM tp JOIN sk ON sk.t = tp.ta
            UNION ALL
            SELECT tp.ta, tp.tb, sk.h FROM tp JOIN sk ON sk.t = tp.tb)),
        un AS (SELECT ta, tb, h FROM (
            SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS r
            FROM mh) WHERE r <= 64),
        ag AS (SELECT un.ta, un.tb, count(*) AS ku_n, max(un.h) AS kthu,
            CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS n_both
          FROM un
          LEFT JOIN sk a ON a.t = un.ta AND a.h = un.h
          LEFT JOIN sk b ON b.t = un.tb AND b.h = un.h
          GROUP BY 1, 2)
        SELECT ag.ta AS type_a, ag.tb AS type_b,
          CASE WHEN sa.kn < 64 THEN sa.kn
            ELSE CAST((63 * CAST($SkMod AS HUGEINT)) // sa.kth AS BIGINT)
            END AS est_a,
          CASE WHEN sb.kn < 64 THEN sb.kn
            ELSE CAST((63 * CAST($SkMod AS HUGEINT)) // sb.kth AS BIGINT)
            END AS est_b,
          CASE WHEN ku_n < 64 THEN ku_n
            ELSE CAST((63 * CAST($SkMod AS HUGEINT)) // kthu AS BIGINT)
            END AS est_union,
          (n_both * CASE WHEN ku_n < 64 THEN ku_n
            ELSE CAST((63 * CAST($SkMod AS HUGEINT)) // kthu AS BIGINT)
            END) // ku_n AS est_inter
        FROM ag
        JOIN ska sa ON sa.t = ag.ta
        JOIN ska sb ON sb.t = ag.tb
        ORDER BY type_a, type_b"""),
      "Pairwise distinct-user intersection estimates from mergeable bottom-k " +
        "sketches — FULL oracle since r14: the production shape (bounded-state " +
        "TopKAgg pass + O(groups*k) driver combine) over the replayable LCG " +
        "hash with integer-exact estimators; the xxhash64 + double path stays " +
        "KmvSpec-bounded."),

    "kmv_intersection_replayable" -> Q(
      (s, d) => {
        import s.implicits._
        // The FULL-ORACLE twin of approx_distinct_intersection — the last
        // rows-only family member gets the ann_ivf/ann_sq8 promotion
        // treatment: swap the unreplayable xxhash64 for an LCG hash over a
        // Mersenne-prime modulus ((A·uid + C) mod 2⁶¹−1 — plain wide-
        // integer arithmetic BOTH engines compute bit-for-bit), and the
        // whole KMV pipeline (per-type bottom-64 sketch, union sketch as
        // the 64 smallest of the merged DISTINCT hashes, the (K−1)·M/kth
        // estimator, sketch-intersection Jaccard, intersection estimate
        // (n_both·D_union) div |union sketch|) becomes windowed integer
        // SQL. The production row keeps xxhash64 (better avalanche) and
        // its KmvSpec error bounds; THIS row is the standing oracle that
        // any drift in sketching/union/estimator logic trips. Scale: one
        // corpus-wide distinct + O(types·K) sketch rows; every window
        // runs on sketch-sized frames.
        val d38 = DecimalType(38, 0)
        val K = 64
        val M = 2305843009213693951L // 2^61 - 1
        val A = 6364136223846793005L
        val C = 1442695040888963407L
        val h = pmod($"user_id".cast(d38) * lit(A).cast(d38) + lit(C).cast(d38),
          lit(M).cast(d38)).cast(LongType)
        val hashes = eventsTable(s, d)
          .select($"event_type".as("t"), h.as("h")).distinct()
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy($"t").orderBy($"h")
        val sk = hashes.withColumn("r", row_number().over(wr)).filter($"r" <= K)
        val tt = sk.select($"t").distinct()
        val tpairs = tt.select($"t".as("ta"))
          .crossJoin(tt.select($"t".as("tb"))).filter($"ta" < $"tb")
        val mh = tpairs.join(sk.select($"t".as("ta"), $"h"), "ta")
          .select($"ta", $"tb", $"h")
          .unionByName(tpairs.join(sk.select($"t".as("tb"), $"h"), "tb")
            .select($"ta", $"tb", $"h"))
          .distinct()
        val wu = org.apache.spark.sql.expressions.Window
          .partitionBy($"ta", $"tb").orderBy($"h")
        val un = mh.withColumn("r", row_number().over(wu)).filter($"r" <= K)
        val est = (kn: org.apache.spark.sql.Column, kth: org.apache.spark.sql.Column) =>
          when(kn < K, kn).otherwise(
            idiv(lit(K - 1).cast(d38) * lit(M).cast(d38), kth.cast(d38))
              .cast(LongType))
        un.join(sk.select($"t".as("ta"), $"h", lit(1L).as("ina")), Seq("ta", "h"), "left")
          .join(sk.select($"t".as("tb"), $"h", lit(1L).as("inb")), Seq("tb", "h"), "left")
          .groupBy($"ta", $"tb")
          .agg(count(lit(1)).as("ku_n"), max($"h").as("kthu"),
            sum(when($"ina".isNotNull && $"inb".isNotNull, 1L).otherwise(0L))
              .as("n_both"))
          .select($"ta".as("type_a"), $"tb".as("type_b"), $"n_both",
            est($"ku_n", $"kthu").as("est_union"),
            idiv($"n_both" * est($"ku_n", $"kthu"), $"ku_n").as("est_inter"))
          .orderBy($"type_a", $"type_b")
      },
      Some(s"""WITH hs AS (SELECT DISTINCT event_type AS t,
            CAST((6364136223846793005 * CAST(user_id AS HUGEINT)
              + 1442695040888963407) % 2305843009213693951 AS BIGINT) AS h
          FROM events),
        sk AS (SELECT t, h FROM (
            SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS r
            FROM hs) WHERE r <= 64),
        tt AS (SELECT DISTINCT t FROM sk),
        tp AS (SELECT a.t AS ta, b.t AS tb FROM tt a JOIN tt b ON a.t < b.t),
        mh AS (SELECT DISTINCT ta, tb, h FROM (
            SELECT tp.ta, tp.tb, sk.h FROM tp JOIN sk ON sk.t = tp.ta
            UNION ALL
            SELECT tp.ta, tp.tb, sk.h FROM tp JOIN sk ON sk.t = tp.tb)),
        un AS (SELECT ta, tb, h FROM (
            SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS r
            FROM mh) WHERE r <= 64),
        ag AS (SELECT un.ta, un.tb, count(*) AS ku_n, max(un.h) AS kthu,
            CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS n_both
          FROM un
          LEFT JOIN sk a ON a.t = un.ta AND a.h = un.h
          LEFT JOIN sk b ON b.t = un.tb AND b.h = un.h
          GROUP BY 1, 2)
        SELECT ta AS type_a, tb AS type_b, n_both,
          CASE WHEN ku_n < 64 THEN ku_n
            ELSE CAST((63 * CAST(2305843009213693951 AS HUGEINT)) // kthu AS BIGINT)
            END AS est_union,
          (n_both * CASE WHEN ku_n < 64 THEN ku_n
            ELSE CAST((63 * CAST(2305843009213693951 AS HUGEINT)) // kthu AS BIGINT)
            END) // ku_n AS est_inter
        FROM ag ORDER BY type_a, type_b"""),
      "KMV intersection with a SQL-replayable LCG hash (Mersenne-prime " +
        "modulus): bottom-64 sketches, union sketch, (K-1)M/kth estimator " +
        "and sketch-Jaccard intersection — the standing oracle twin of the " +
        "xxhash64 production row, windowed integer SQL end to end."),

    "q21b_sole_late_supplier" -> Q(
      (s, d) => {
        import s.implicits._
        // The TPC-H Q21 shape (suppliers who kept orders waiting) adapted to
        // this schema: suppliers whose line items shipped late (> 60 days
        // after the order date) on multi-supplier orders where EVERY OTHER
        // supplier shipped on time — the classic double-correlated
        // EXISTS/NOT-EXISTS, decorrelated Spark-first into two hash
        // aggregates instead of two lineitem self-joins: per
        // (order, supplier) fold the late flag, per order count suppliers
        // and late suppliers, keep orders with >= 2 suppliers and exactly
        // one late one, credit that supplier. Both aggregates shuffle on
        // l_orderkey (AQE reuses the partitioning for the re-join); the
        // supplier name lookup is a broadcast; the top-20 runs as
        // TakeOrderedAndProject. No self-join ever materializes
        // lineitem x lineitem.
        val sixtyDaysUs = 60L * 86400000000L
        val ol = table(s, d, "lineitem")
          .join(table(s, d, "orders").select($"o_orderkey", $"o_orderdate"),
            $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"l_suppkey",
            when(micros($"l_shipdate") > micros($"o_orderdate") + sixtyDaysUs, 1L)
              .otherwise(0L).as("lt"))
          .groupBy($"l_orderkey", $"l_suppkey")
          .agg(max($"lt").as("late"))
        val po = ol.groupBy($"l_orderkey")
          .agg(count(lit(1)).as("n_supp"), sum($"late").as("n_late"))
          .filter($"n_supp" >= 2 && $"n_late" === 1)
          .select($"l_orderkey")
        ol.filter($"late" === 1L)
          .join(po, "l_orderkey")
          .groupBy($"l_suppkey").agg(count(lit(1)).as("numwait"))
          .join(broadcast(table(s, d, "supplier").select($"s_suppkey", $"s_name")),
            $"l_suppkey" === $"s_suppkey")
          .select($"s_name", $"numwait")
          .orderBy(desc("numwait"), $"s_name")
          .limit(20)
      },
      Some("""WITH ol AS (SELECT l_orderkey, l_suppkey,
            max(CASE WHEN epoch_us(l_shipdate) > epoch_us(o_orderdate) + 5184000000000
              THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
        po AS (SELECT l_orderkey FROM ol GROUP BY 1
          HAVING count(*) >= 2 AND sum(late) = 1)
        SELECT s_name, count(*) AS numwait
        FROM ol JOIN po USING (l_orderkey) JOIN supplier ON l_suppkey = s_suppkey
        WHERE late = 1
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"""),
      "TPC-H Q21 shape (sole late supplier on multi-supplier orders): the " +
        "double-correlated EXISTS decorrelated into two orderkey-keyed hash " +
        "aggregates — no lineitem self-join; broadcast dim, TakeOrdered top-20.")
  )
}
