package graft.queries

import graft.{core, Q}
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.2 additions: business-analytics operators over the event/order tables.
  *
  * Shapes here the rest of the relational module doesn't cover: arg-extrema
  * aggregation (OHLC open/close via `min_by`/`max_by` on a lexicographic
  * (off, event_id) struct order — one hash aggregate, no per-bucket window
  * sort), duration-weighted
  * averages as integer-exact sufficient statistics, per-column survivorship
  * (filtered arg-max per column in ONE aggregate pass), privacy risk scans,
  * and association-rule mining in parts-per-million integer arithmetic.
  *
  * All money/ratio outputs follow the SURVEY §5 scaled-integer conventions
  * (BIGINT units of 10^-k; integer `div` on both engines) so driver hashing
  * is representation-proof.
  */
object Analytics {

  val defs: Seq[(String, Q)] = Seq(

    "ohlc_bars" -> Q(
      (s, d) => {
        import s.implicits._
        // OHLC candlesticks: per (event_type, day), the first/last value by
        // event time plus min/max. open/close are ARG-extrema — min_by/max_by
        // on a STRUCT order (micros within the day, event_id tiebreak,
        // compared lexicographically) — so the whole bar is ONE
        // partial-aggregating hash aggregate: no per-bucket sort, no window.
        // The struct order is collision-free at ANY event_id domain (a packed
        // `off*K + event_id` BIGINT would collide once event_id ≥ K and
        // overflow near 2^63 — unacceptable at 100 TB). At scale this is a
        // single shuffle keyed by (type, day) with map-side combine; a window
        // formulation would sort every bucket.
        val off = micros($"ts") - micros(date_trunc("day", $"ts"))
        val ord = struct(off.as("o"), $"event_id".as("e"))
        eventsTable(s, d)
          .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
          .agg(
            min_by($"value", ord).as("open"),
            max($"value").as("high"),
            min($"value").as("low"),
            max_by($"value", ord).as("close"),
            count(lit(1)).as("n"))
          .select(micros($"day").as("day_us"), $"event_type",
            $"open", $"high", $"low", $"close", $"n")
          .orderBy($"day_us", $"event_type")
      },
      // DuckDB 1.0 arg_min cannot order by a struct, so the oracle mirrors
      // the lexicographic (off, event_id) tiebreak with row_number windows —
      // fine for the oracle, which only ever runs at verification scale.
      Some("""WITH e AS (
          SELECT event_type, date_trunc('day', ts) AS day, value,
                 epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS off,
                 event_id
          FROM events),
        r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY event_type, day
                                    ORDER BY off, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, day
                                    ORDER BY off DESC, event_id DESC) AS rn_d
          FROM e)
        SELECT epoch_us(day) AS day_us, event_type,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high, min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS n
        FROM r GROUP BY event_type, day ORDER BY day_us, event_type"""),
      "OHLC bars: arg-extrema (min_by/max_by on a struct (off, event_id) " +
        "lexicographic order) fold open/close into the same single hash " +
        "aggregate as high/low — no per-bucket window sort at any scale."),

    "time_weighted_avg" -> Q(
      (s, d) => {
        import s.implicits._
        // Duration-weighted mean (sensor/billing semantics): each reading
        // holds until the next one for the same type, so its weight is that
        // interval. lead() needs one sort per type partition — unavoidable
        // for interval construction — but the aggregate emits integer-exact
        // SUFFICIENT STATISTICS (weighted sum in 10^-2 units, total
        // milliseconds) instead of a drifting double division; the quotient
        // is integer `div`, identical on both engines. The last reading per
        // type has no successor and carries zero weight on both sides.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"us", $"event_id")
        val withDur = eventsTable(s, d)
          .select($"event_type", $"event_id", micros($"ts").as("us"), $"value")
          .withColumn("dur_us", coalesce(lead($"us", 1).over(w), $"us") - $"us")
          // integer div PER ROW (Spark's `/` on longs is double division —
          // summing fractional milliseconds would drift from the mirror)
          .withColumn("dur_ms", expr("dur_us div 1000"))
        withDur
          .groupBy($"event_type")
          .agg(
            moneyE(sum(dec2($"value") * $"dur_ms".cast(DecimalType(18, 0))), 2)
              .as("wsum_c"),
            sum($"dur_ms").cast(LongType).as("dur_ms"))
          // explicit zero guard: a single-reading group has total duration 0;
          // Spark's `div` would yield NULL but DuckDB's `//` raises, so BOTH
          // engines take the same CASE branch and stay comparable on edge data
          .withColumn("twa_c",
            when($"dur_ms" === 0L, lit(null).cast(LongType))
              .otherwise(expr("wsum_c div dur_ms")))
          .select($"event_type", $"dur_ms", $"wsum_c", $"twa_c")
          .orderBy($"event_type")
      },
      Some(s"""WITH e AS (
          SELECT event_type, epoch_us(ts) AS us, value,
                 (coalesce(lead(epoch_us(ts)) OVER (PARTITION BY event_type
                    ORDER BY epoch_us(ts), event_id), epoch_us(ts))
                   - epoch_us(ts)) // 1000 AS dur_ms
          FROM events)
        SELECT event_type, CAST(SUM(dur_ms) AS BIGINT) AS dur_ms,
               ${moneyESql("SUM(CAST(value AS DECIMAL(18,2)) * CAST(dur_ms AS DECIMAL(18,0)))", 2)} AS wsum_c,
               CASE WHEN CAST(SUM(dur_ms) AS BIGINT) = 0 THEN NULL
                    ELSE ${moneyESql("SUM(CAST(value AS DECIMAL(18,2)) * CAST(dur_ms AS DECIMAL(18,0)))", 2)} // CAST(SUM(dur_ms) AS BIGINT)
               END AS twa_c
        FROM e GROUP BY event_type ORDER BY event_type"""),
      "Time-weighted average via integer-exact sufficient statistics: " +
        "value x holding-interval in scaled-decimal, quotient by integer div " +
        "on both engines — no floating division anywhere."),

    "golden_record" -> Q(
      (s, d) => {
        import s.implicits._
        // Survivorship / golden-record merge (the MDM consolidation step):
        // per customer, each attribute independently takes its most recent
        // NON-NULL observation — different columns may win from different
        // rows. Emulates a sparse multi-source feed deterministically:
        // status is unreported by the "F-source" and priority by urgent
        // rows, so the per-column filtered recency is load-bearing, not
        // vacuous. ONE aggregate pass: max_by over an order that is NULLed
        // where the column is unobserved (null orders are ignored by
        // max_by / arg_max FILTER on both engines) — no per-column
        // self-joins, no windows; scales as a single keyed shuffle.
        val ord = unix_date($"o_orderdate".cast(DateType)).cast(LongType) *
          lit(10000000000L) + $"o_orderkey"
        val src = table(s, d, "orders")
          .withColumn("status_obs",
            when($"o_orderstatus" === "F", lit(null).cast(StringType))
              .otherwise($"o_orderstatus"))
          .withColumn("prio_obs",
            when($"o_orderpriority".startsWith("1"), lit(null).cast(StringType))
              .otherwise($"o_orderpriority"))
        src.groupBy($"o_custkey")
          .agg(
            max_by($"status_obs", when($"status_obs".isNotNull, ord)).as("last_status"),
            max_by($"prio_obs", when($"prio_obs".isNotNull, ord)).as("last_priority"),
            count(lit(1)).as("n_orders"),
            moneyE(sum(dec2($"o_totalprice")), 2).as("lifetime_value_c"),
            max(ord).as("last_seen_ord"))
          .orderBy($"o_custkey")
      },
      Some(s"""WITH src AS (
          SELECT o_custkey,
                 CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS status_obs,
                 CASE WHEN o_orderpriority LIKE '1%' THEN NULL ELSE o_orderpriority END AS prio_obs,
                 o_totalprice,
                 CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                   * 10000000000 + o_orderkey AS ord
          FROM orders)
        SELECT o_custkey,
               arg_max(status_obs, ord) FILTER (status_obs IS NOT NULL) AS last_status,
               arg_max(prio_obs, ord) FILTER (prio_obs IS NOT NULL) AS last_priority,
               count(*) AS n_orders,
               ${moneyESql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS lifetime_value_c,
               max(ord) AS last_seen_ord
        FROM src GROUP BY o_custkey ORDER BY o_custkey"""),
      "Golden-record survivorship: per-column latest-non-null in one " +
        "aggregate pass (max_by with NULLed order ≡ arg_max FILTER), " +
        "different columns winning from different source rows."),

    "k_anonymity" -> Q(
      (s, d) => {
        import s.implicits._
        // Privacy risk scan: quasi-identifier combinations (nation, market
        // segment, account-balance band) whose group is smaller than k=5 —
        // the re-identifiable rows a training-data release must suppress or
        // generalize. One hash aggregate + a HAVING filter; the band edge
        // uses floor on the same IEEE double op both engines share.
        table(s, d, "customer")
          .groupBy($"c_nationkey", $"c_mktsegment",
            floor($"c_acctbal" / lit(1000.0)).cast(LongType).as("bal_band"))
          .agg(count(lit(1)).as("group_size"))
          .filter($"group_size" < 5)
          .orderBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      },
      Some("""SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               count(*) AS group_size
        FROM customer GROUP BY 1, 2, 3 HAVING count(*) < 5
        ORDER BY 1, 2, 3"""),
      "k-anonymity violation scan: quasi-identifier groups below k=5, one " +
        "aggregate + HAVING — the release-gate privacy check."),

    "association_rules" -> Q(
      (s, d) => {
        import s.implicits._
        // Association rules over order baskets: for each co-purchased part
        // pair, support/confidence/lift in parts-per-million INTEGER
        // arithmetic (exact on both engines; no floating ratios). Pair
        // generation reuses the bounded-basket self-join (≤7 items/order →
        // O(rows×basket) pairs, never O(N²)); per-part counts join back
        // BROADCAST (O(parts) rows at this key space; at a 100 TB key space
        // the same plan degrades gracefully to a shuffled hash join under
        // AQE — nothing here requires the broadcast). Rules are emitted in
        // both directions since confidence is asymmetric.
        val op = table(s, d, "lineitem")
          .select($"l_orderkey", $"l_partkey").distinct()
        val nOrders = table(s, d, "orders").select($"o_orderkey").distinct().count()
        val partCnt = op.groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
        val pairs = op.as("a").join(op.as("b"),
            $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
          .groupBy($"a.l_partkey".as("pa"), $"b.l_partkey".as("pb"))
          .agg(count(lit(1)).as("n_ab"))
          .filter($"n_ab" >= 3)
        val rules = pairs
          .select($"pa".as("antecedent"), $"pb".as("consequent"), $"n_ab")
          .unionByName(pairs.select($"pb".as("antecedent"), $"pa".as("consequent"), $"n_ab"))
        rules
          .join(broadcast(partCnt).withColumnRenamed("cnt", "cnt_a"),
            $"antecedent" === $"l_partkey").drop("l_partkey")
          .join(broadcast(partCnt).withColumnRenamed("cnt", "cnt_b"),
            $"consequent" === $"l_partkey").drop("l_partkey")
          .withColumn("support_ppm", expr(s"n_ab * 1000000 div $nOrders"))
          .withColumn("confidence_ppm", expr("n_ab * 1000000 div cnt_a"))
          .withColumn("lift_ppm", expr(s"n_ab * $nOrders * 1000000 div (cnt_a * cnt_b)"))
          .select($"antecedent", $"consequent", $"n_ab",
            $"support_ppm", $"confidence_ppm", $"lift_ppm")
          .orderBy(desc("confidence_ppm"), $"antecedent", $"consequent")
          .limit(100)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          n AS (SELECT count(DISTINCT o_orderkey) AS n_orders FROM orders),
          pc AS (SELECT l_partkey, count(*) AS cnt FROM op GROUP BY 1),
          pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
                 FROM op a JOIN op b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                 GROUP BY 1, 2 HAVING count(*) >= 3),
          rules AS (
            SELECT pa AS antecedent, pb AS consequent, n_ab FROM pr
            UNION ALL
            SELECT pb AS antecedent, pa AS consequent, n_ab FROM pr)
        SELECT antecedent, consequent, n_ab,
               n_ab * 1000000 // n.n_orders AS support_ppm,
               n_ab * 1000000 // ca.cnt AS confidence_ppm,
               n_ab * n.n_orders * 1000000 // (ca.cnt * cb.cnt) AS lift_ppm
        FROM rules, n
        JOIN pc ca ON rules.antecedent = ca.l_partkey
        JOIN pc cb ON rules.consequent = cb.l_partkey
        ORDER BY confidence_ppm DESC, antecedent, consequent LIMIT 100"""),
      "Association rules (support/confidence/lift) in ppm integer math: " +
        "bounded-basket pair join, broadcast per-part counts, both rule " +
        "directions, deterministic top-100."),

    "dau_mau_stickiness" -> Q(
      (s, d) => {
        import s.implicits._
        // DAU/MAU STICKINESS per month — the engagement-frequency ratio
        // product analytics leads with (how much of the monthly audience
        // shows up daily): Σ(daily distinct users) over a month vs
        // days·MAU, as an exact e6 integer quotient. Two distinct
        // aggregates at the day and month grain — both corpus-sized passes
        // are plain groupBy count-distincts, no window; the month rollup
        // runs on O(days) rows.
        val d38 = DecimalType(38, 0)
        val ev = eventsTable(s, d)
          .select($"user_id", micros(date_trunc("day", $"ts")).as("day_us"),
            date_format($"ts", "yyyy-MM").as("month"))
        val daily = ev.groupBy($"month", $"day_us")
          .agg(countDistinct($"user_id").as("dau"))
          .groupBy($"month")
          .agg(count(lit(1)).as("n_days"), sum($"dau").as("dau_sum"))
        val mau = ev.groupBy($"month")
          .agg(countDistinct($"user_id").as("mau"))
        daily.join(mau, "month")
          .select($"month", $"n_days", $"dau_sum", $"mau",
            idiv(lit(1000000L).cast(d38) * $"dau_sum".cast(d38),
              $"n_days".cast(d38) * $"mau".cast(d38)).cast(LongType)
              .as("stickiness_e6"))
          .orderBy($"month")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('day', ts) AS dday,
            strftime(ts, '%Y-%m') AS month FROM events),
        daily AS (SELECT month, count(*) AS n_days,
            CAST(sum(dau) AS BIGINT) AS dau_sum FROM (
              SELECT month, dday, count(DISTINCT user_id) AS dau
              FROM e GROUP BY 1, 2) GROUP BY 1),
        mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
          FROM e GROUP BY 1)
        SELECT month, n_days, dau_sum, mau,
          CAST((1000000 * CAST(dau_sum AS HUGEINT))
            // (CAST(n_days AS HUGEINT) * mau) AS BIGINT) AS stickiness_e6
        FROM daily JOIN mau USING (month) ORDER BY month"""),
      "DAU/MAU stickiness per month (avg daily actives over monthly " +
        "actives, exact e6): two grain aggregates, no window — the " +
        "engagement-frequency readout beside the retention cohorts."),

    "bot_burst_detection" -> Q(
      (s, d) => {
        import s.implicits._
        // BOT-BURST detection — the behavioral curation gate upstream of
        // any engagement-trained model (interarrival_stats profiles the
        // distribution; this FLAGS): a burst is a maximal run of
        // consecutive same-user events with inter-arrival under the burst
        // threshold, and a user flags when any run reaches 4 events. The
        // thresholds are tuned to THIS corpus's hours-scale cadence (4 h —
        // its minimum gap is ~8 s and p5 ~33 min; a click-fraud feed would
        // use seconds with the identical plan). The
        // run build is gaps-and-islands on the lagged inter-arrival — one
        // keyed window pass; per-user history is the scale bound. Output:
        // every flagged user with their burst census.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"us", $"event_id")
        val ev = eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("us"))
          .withColumn("gap", $"us" - lag($"us", 1).over(w))
          .withColumn("brk", when($"gap".isNull || $"gap" >= 14400000000L, 1L)
            .otherwise(0L))
          .withColumn("run_id", sum($"brk").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
              .orderBy($"us", $"event_id")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        val runs = ev.groupBy($"user_id", $"run_id")
          .agg(count(lit(1)).as("run_len"))
        runs.groupBy($"user_id")
          .agg(max($"run_len").as("longest_burst"),
            sum(when($"run_len" >= 4, 1L).otherwise(0L)).as("n_bursts"),
            sum(when($"run_len" >= 4, $"run_len").otherwise(0L)).as("burst_events"))
          .filter($"longest_burst" >= 4)
          .orderBy($"user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        g AS (SELECT user_id, event_id, us,
            us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
          FROM e),
        b AS (SELECT *, CASE WHEN gap IS NULL OR gap >= 14400000000 THEN 1 ELSE 0 END AS brk
          FROM g),
        i AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id
            ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS run_id FROM b),
        r AS (SELECT user_id, run_id, count(*) AS run_len FROM i GROUP BY 1, 2)
        SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest_burst,
          CAST(sum(CASE WHEN run_len >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
          CAST(sum(CASE WHEN run_len >= 4 THEN run_len ELSE 0 END) AS BIGINT) AS burst_events
        FROM r GROUP BY 1 HAVING max(run_len) >= 4 ORDER BY user_id"""),
      "Bot-burst detection (runs of ≥ 4 events under the burst gap): " +
        "gaps-and-islands on the lagged inter-arrival, one keyed window " +
        "pass — the behavioral curation gate before engagement training."),

    "cross_correlation" -> Q(
      (s, d) => {
        import s.implicits._
        // LEAD-LAG cross-correlation between two daily series (does click
        // volume lead purchase volume, and by how many days?) — the
        // two-series companion to autocorr_lags' self-probe. Daily counts
        // join on (click day + k = purchase day) for k = 0..7; Pearson per
        // lag from integer sufficient statistics, emitted sqrt-free as
        // sign + ρ²·10⁶ with the spearman zero-variance guard (a constant
        // series divides by zero differently across engines). Corpus-sized
        // work = one day aggregate; the lag fan-out (8×) rides the
        // O(days) table, never the events.
        val d38 = DecimalType(38, 0)
        val day = 86400000000L
        val byDay = eventsTable(s, d)
          .filter($"event_type".isin("click", "purchase"))
          .groupBy(micros(date_trunc("day", $"ts")).as("day_us"), $"event_type")
          .agg(count(lit(1)).as("n"))
        val c = byDay.filter($"event_type" === "click")
          .select($"day_us", $"n".as("x"))
        val p = byDay.filter($"event_type" === "purchase")
          .select($"day_us".as("p_day"), $"n".as("y"))
        val sums = c.withColumn("lag_k", explode(sequence(lit(0L), lit(7L))))
          .withColumn("p_day", $"day_us" + $"lag_k" * day)
          .join(p, "p_day")
          .groupBy($"lag_k")
          .agg(count(lit(1)).as("n_days"),
            sum($"x").as("sx"), sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
            sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
          .withColumn("num", $"n_days" * $"sxy" - $"sx" * $"sy")
          .withColumn("den_x", $"n_days" * $"sxx" - $"sx" * $"sx")
          .withColumn("den_y", $"n_days" * $"syy" - $"sy" * $"sy")
        sums.select($"lag_k", $"n_days",
            signum($"num").cast("long").as("rho_sign"),
            when($"den_x".cast(d38) * $"den_y".cast(d38) === 0, lit(0L))
              .otherwise(idiv(lit(1000000L).cast(d38) * $"num".cast(d38) * $"num".cast(d38),
                $"den_x".cast(d38) * $"den_y".cast(d38)).cast("long"))
              .as("rho2_e6"))
          .orderBy($"lag_k")
      },
      Some("""WITH bd AS (SELECT date_trunc('day', ts) AS dday, event_type,
            count(*) AS n FROM events
          WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2),
        c AS (SELECT dday, CAST(n AS BIGINT) AS x FROM bd WHERE event_type = 'click'),
        p AS (SELECT dday AS p_day, CAST(n AS BIGINT) AS y FROM bd
          WHERE event_type = 'purchase'),
        j AS (SELECT lag_k, x, y FROM c
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS lag_k)
          JOIN p ON p_day = dday + to_days(lag_k::INT)),
        a AS (SELECT lag_k, count(*) AS n_days,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(x * y) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx,
            CAST(sum(y * y) AS BIGINT) AS syy
          FROM j GROUP BY 1),
        f AS (SELECT lag_k, n_days,
            n_days * sxy - sx * sy AS num,
            n_days * sxx - sx * sx AS den_x,
            n_days * syy - sy * sy AS den_y
          FROM a)
        SELECT CAST(lag_k AS BIGINT) AS lag_k, n_days,
          CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS rho_sign,
          CAST(CASE WHEN CAST(den_x AS HUGEINT) * den_y = 0 THEN 0
            ELSE (1000000 * CAST(num AS HUGEINT) * num)
              // (CAST(den_x AS HUGEINT) * den_y) END AS BIGINT) AS rho2_e6
        FROM f ORDER BY lag_k"""),
      "Lead-lag cross-correlation (click volume vs purchase volume at lags " +
        "0..7 days): integer sufficient statistics over the O(days) " +
        "aggregate, sqrt-free sign + rho2_e6 emission with the " +
        "zero-variance guard."),

    "autocorr_lags" -> Q(
      (s, d) => {
        import s.implicits._
        // Per-series autocorrelation at lags 1..5 — the seasonality probe a
        // metrics pipeline runs before fitting anything. The series key is
        // event_type (the window partitions by it; per-series length is the
        // scale bound, exactly like any keyed time-series store). ONE window
        // pass computes all five lags; centering is avoided by the sufficient-
        // statistics identity n·Σxy − Σx·Σy, so every sum is integer-exact
        // over x = floor(100·value) and the only doubles are the final
        // IEEE-exact sqrt/divide of identical BIGINTs on both engines.
        // Magnitudes: x ≤ 5·10⁴, so n·Σx² ≤ n²·x̄² stays under 2⁶³ while
        // n ≤ ~6·10⁴ per series — beyond that, shard the series or widen to
        // DECIMAL(38,0).
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("ts", "event_id")
        val base = eventsTable(s, d)
          .select($"event_type", $"ts", $"event_id",
            floor($"value" * 100).cast("long").as("x"))
          .select($"event_type", $"x",
            lag($"x", 1).over(w).as("l1"), lag($"x", 2).over(w).as("l2"),
            lag($"x", 3).over(w).as("l3"), lag($"x", 4).over(w).as("l4"),
            lag($"x", 5).over(w).as("l5"))
        base.selectExpr("event_type", "x",
            "stack(5, 1L, l1, 2L, l2, 3L, l3, 4L, l4, 5L, l5) AS (lag_k, lx)")
          .filter($"lx".isNotNull)
          .groupBy($"event_type", $"lag_k")
          .agg(count(lit(1)).as("n_pairs"),
            sum($"x").as("sx"), sum($"lx").as("sy"), sum($"x" * $"lx").as("sxy"),
            sum($"x" * $"x").as("sxx"), sum($"lx" * $"lx").as("syy"))
          .select($"event_type", $"lag_k", $"n_pairs",
            ($"n_pairs" * $"sxy" - $"sx" * $"sy").as("num"),
            ($"n_pairs" * $"sxx" - $"sx" * $"sx").as("den_x"),
            ($"n_pairs" * $"syy" - $"sy" * $"sy").as("den_y"))
          .withColumn("rho", $"num".cast("double") /
            (sqrt($"den_x".cast("double")) * sqrt($"den_y".cast("double"))))
          .orderBy("event_type", "lag_k")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(floor(value * 100) AS BIGINT) AS x,
            lag(CAST(floor(value * 100) AS BIGINT), 1) OVER w AS l1,
            lag(CAST(floor(value * 100) AS BIGINT), 2) OVER w AS l2,
            lag(CAST(floor(value * 100) AS BIGINT), 3) OVER w AS l3,
            lag(CAST(floor(value * 100) AS BIGINT), 4) OVER w AS l4,
            lag(CAST(floor(value * 100) AS BIGINT), 5) OVER w AS l5
          FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        u AS (SELECT event_type, 1 AS k, x, l1 AS lx FROM e
          UNION ALL SELECT event_type, 2, x, l2 FROM e
          UNION ALL SELECT event_type, 3, x, l3 FROM e
          UNION ALL SELECT event_type, 4, x, l4 FROM e
          UNION ALL SELECT event_type, 5, x, l5 FROM e),
        g AS (SELECT event_type, k, count(*) AS n,
            CAST(sum(x) AS BIGINT) AS sx, CAST(sum(lx) AS BIGINT) AS sy,
            CAST(sum(x * lx) AS BIGINT) AS sxy,
            CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(lx * lx) AS BIGINT) AS syy
          FROM u WHERE lx IS NOT NULL GROUP BY 1, 2)
        SELECT event_type, CAST(k AS BIGINT) AS lag_k, n AS n_pairs,
          n * sxy - sx * sy AS num,
          n * sxx - sx * sx AS den_x, n * syy - sy * sy AS den_y,
          CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
        FROM g ORDER BY event_type, lag_k"""),
      "Lag-1..5 autocorrelation per series: one window pass for all lags, " +
        "integer sufficient statistics (n·Σxy − Σx·Σy), doubles only in the " +
        "final IEEE-exact sqrt/divide of identical BIGINTs.")
  ) ++ Seq(

    "anomaly_zscore" -> Q(
      (s, d) => {
        import s.implicits._
        // Per-series 3σ outlier flags WITHOUT computing a single float:
        // |x−μ| > 3σ  ⟺  (n·x−S)² > 9·(n·Σx²−S²)  after multiplying through
        // by n² — so z² = (n·x−S)²/(n·Σx²−S²) is emitted as an e6-scaled
        // integer both engines floor-divide identically (numerator squared,
        // denominator ≥ 0: no negative operand ever reaches the division).
        // Shape: one partial-aggregated stats pass per event_type, then the
        // O(series) stats frame joins back broadcast — no window, no sort,
        // so the scan side streams at 100 TB. Products run in DECIMAL(38,0)
        // (HUGEINT in the mirror): n·x ~ 10⁹ already at sf0.1, and (n·x−S)²
        // crosses 2⁶³ two orders of magnitude later — BIGINT would overflow
        // exactly when the data got big enough to matter.
        val v = eventsTable(s, d).select($"event_id", $"event_type",
          (dec2($"value") * 100).cast(LongType).as("value_c"))
        val st = v.groupBy($"event_type").agg(
          count(lit(1)).as("n"), sum($"value_c").as("s"),
          sum($"value_c" * $"value_c").as("ss"))
        val d38 = DecimalType(38, 0)
        val num0 = ($"n" * $"value_c" - $"s").cast(d38)
        val den = greatest(
          $"n".cast(d38) * $"ss" - $"s".cast(d38) * $"s", lit(1L).cast(d38))
        v.join(broadcast(st), "event_type")
          .withColumn("z2_e6", idiv(lit(1000000L) * num0 * num0, den))
          .filter($"z2_e6" > 9000000L)
          .select($"event_id", $"event_type", $"value_c", $"z2_e6")
          .orderBy($"event_id")
      },
      Some("""WITH v AS (SELECT event_id, event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_c
            FROM events),
          st AS (SELECT event_type, count(*) AS n,
              CAST(sum(value_c) AS BIGINT) AS s,
              CAST(sum(value_c * value_c) AS BIGINT) AS ss
            FROM v GROUP BY 1),
          z AS (SELECT event_id, v.event_type, value_c,
              CAST((1000000 * CAST(st.n * value_c - st.s AS HUGEINT)
                            * CAST(st.n * value_c - st.s AS HUGEINT))
                   // greatest(CAST(st.n AS HUGEINT) * st.ss
                              - CAST(st.s AS HUGEINT) * st.s, 1)
                   AS BIGINT) AS z2_e6
            FROM v JOIN st ON v.event_type = st.event_type)
        SELECT event_id, event_type, value_c, z2_e6 FROM z
        WHERE z2_e6 > 9000000 ORDER BY event_id"""),
      "Integer-exact 3σ outlier scan: (n·x−S)² > 9·(n·Σx²−S²) with products " +
        "in DECIMAL(38,0)/HUGEINT — broadcast stats join, no window, no " +
        "floats anywhere."),

    "event_path_topk" -> Q(
      (s, d) => {
        import s.implicits._
        // Sequence mining: each user's first-5 event-type path, then the
        // most common paths — the onboarding-funnel shape a product
        // pipeline mines before building anything fancier. The window sorts
        // per user (per-key volume is the scale bound, as for any
        // sessionizer); after the rn ≤ 5 filter the per-user state is O(5).
        // The path string is built order-deterministically on both engines:
        // array_sort on (rn, type) structs ≡ string_agg ORDER BY rn.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val firstN = eventsTable(s, d)
          .select($"user_id", $"event_type", row_number().over(w).as("rn"))
          .filter($"rn" <= 5)
        firstN.groupBy($"user_id")
          .agg(array_join(
            transform(array_sort(collect_list(struct($"rn", $"event_type"))),
              x => x.getField("event_type")), ">").as("path"))
          .groupBy($"path").agg(count(lit(1)).as("n_users"))
          .orderBy(desc("n_users"), $"path")
          .limit(20)
      },
      Some("""WITH r AS (SELECT user_id, event_type,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
          p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 5 GROUP BY 1)
        SELECT path, count(*) AS n_users FROM p
        GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20"""),
      "First-5-event path mining per user: windowed take-5, deterministic " +
        "in-order path join, top-20 paths with a full tiebreak."),

    "l_diversity" -> Q(
      (s, d) => {
        import s.implicits._
        // The companion release-gate to k_anonymity: a QI group can be
        // large (k-anonymous) yet still leak if every member shares the
        // sensitive value. Flags QI groups whose distinct-sensitive count
        // is < 3 over the released customer×orders join. LEFT join keeps
        // order-less customers (0 distinct priorities — maximally
        // homogeneous, exactly the rows a release must catch); Spark's
        // null-skipping countDistinct ≡ DuckDB's count(DISTINCT col).
        val c = table(s, d, "customer")
          .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
            floor($"c_acctbal" / lit(1000.0)).cast(LongType).as("bal_band"))
        val o = table(s, d, "orders").select($"o_custkey", $"o_orderpriority")
        c.join(o, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
          .agg(count(lit(1)).as("group_size"),
            countDistinct($"o_orderpriority").as("n_sensitive"))
          .filter($"n_sensitive" < 3)
          .orderBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      },
      Some("""SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               count(*) AS group_size,
               count(DISTINCT o_orderpriority) AS n_sensitive
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1, 2, 3 HAVING count(DISTINCT o_orderpriority) < 3
        ORDER BY 1, 2, 3"""),
      "l-diversity violation scan (l=3): QI groups whose sensitive " +
        "attribute is near-homogeneous — the leak k-anonymity alone misses.")
  ) ++ Seq(

    "benford_digit_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Benford's-law audit of the money column — the fabricated-data
        // tripwire every financial QA battery runs. First significant
        // digit of o_totalprice vs the log10(1+1/d) expectation, which is
        // pinned as e6 INTEGER literals (the only way both engines agree
        // bit-for-bit; computing log10 at runtime would reintroduce float
        // reduction order). One hash aggregate over 9 groups; the total is
        // a broadcast scalar.
        val digit = floor($"o_totalprice").cast(LongType)
          .cast(StringType).substr(1, 1).cast(LongType)
        val byDigit = table(s, d, "orders")
          .select(digit.as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("n"))
        val total = byDigit.agg(sum($"n").as("total"))
        byDigit.crossJoin(broadcast(total))
          .withColumn("obs_share_e6", idiv(lit(1000000L) * $"n", $"total"))
          .withColumn("exp_share_e6", expr("""CASE digit
            WHEN 1 THEN 301029L WHEN 2 THEN 176091L WHEN 3 THEN 124938L
            WHEN 4 THEN 96910L  WHEN 5 THEN 79181L  WHEN 6 THEN 66946L
            WHEN 7 THEN 57991L  WHEN 8 THEN 51152L  ELSE 45757L END"""))
          .withColumn("dev_e6", abs($"obs_share_e6" - $"exp_share_e6"))
          .select($"digit", $"n", $"obs_share_e6", $"exp_share_e6", $"dev_e6")
          .orderBy($"digit")
      },
      Some("""WITH b AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders),
          g AS (SELECT digit, count(*) AS n FROM b GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        SELECT digit, n,
          (1000000 * n) // t.total AS obs_share_e6,
          CAST(CASE digit
            WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
            WHEN 4 THEN 96910  WHEN 5 THEN 79181  WHEN 6 THEN 66946
            WHEN 7 THEN 57991  WHEN 8 THEN 51152  ELSE 45757 END AS BIGINT) AS exp_share_e6,
          abs((1000000 * n) // t.total - CASE digit
            WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
            WHEN 4 THEN 96910  WHEN 5 THEN 79181  WHEN 6 THEN 66946
            WHEN 7 THEN 57991  WHEN 8 THEN 51152  ELSE 45757 END) AS dev_e6
        FROM g, t ORDER BY digit"""),
      "Benford first-digit audit: observed vs log10(1+1/d) shares as e6 " +
        "integers (expectation pinned as literals — no runtime log10), " +
        "9-group aggregate + broadcast total."),

    "dow_seasonality" -> Q(
      (s, d) => {
        import s.implicits._
        // Calendar seasonality profile: per (event_type, day-of-week), the
        // value index vs the series' overall mean — index_e6 =
        // 10⁶·(sum_dow·n_total)÷(n_dow·sum_total), the cross-multiplied
        // mean ratio so no division happens before the final floor. The
        // numerator crosses 2⁶³ at ~10⁵ events/series (sum_dow ~ 5·10⁸
        // cents × n_total 10⁵ × 10⁶), so products run DECIMAL(38,0)/
        // HUGEINT. Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday —
        // the mirror adds 1.
        val d38 = DecimalType(38, 0)
        val v = eventsTable(s, d).select($"event_type",
          dayofweek($"ts").cast(LongType).as("dow"),
          (dec2($"value") * 100).cast(LongType).as("vc"))
        val byDow = v.groupBy($"event_type", $"dow")
          .agg(count(lit(1)).as("n_dow"), sum($"vc").as("sum_dow"))
        val byType = v.groupBy($"event_type")
          .agg(count(lit(1)).as("n_total"), sum($"vc").as("sum_total"))
        byDow.join(broadcast(byType), "event_type")
          .withColumn("index_e6",
            idiv(lit(1000000L).cast(d38) * $"sum_dow".cast(d38) * $"n_total",
              $"n_dow".cast(d38) * $"sum_total"))
          .select($"event_type", $"dow", $"n_dow", $"sum_dow", $"index_e6")
          .orderBy($"event_type", $"dow")
      },
      Some("""WITH v AS (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
            FROM events),
          bd AS (SELECT event_type, dow, count(*) AS n_dow,
              CAST(sum(vc) AS BIGINT) AS sum_dow FROM v GROUP BY 1, 2),
          bt AS (SELECT event_type, count(*) AS n_total,
              CAST(sum(vc) AS BIGINT) AS sum_total FROM v GROUP BY 1)
        SELECT bd.event_type, dow, n_dow, sum_dow,
          CAST((1000000 * CAST(sum_dow AS HUGEINT) * n_total)
               // (CAST(n_dow AS HUGEINT) * sum_total) AS BIGINT) AS index_e6
        FROM bd JOIN bt ON bd.event_type = bt.event_type
        ORDER BY bd.event_type, dow"""),
      "Day-of-week seasonality index per series: cross-multiplied mean " +
        "ratio in e6 integer arithmetic (DECIMAL(38,0)/HUGEINT), broadcast " +
        "per-series totals."),

    "seasonal_decompose" -> Q(
      (s, d) => {
        import s.implicits._
        // Classical additive decomposition of each series' daily revenue:
        // value = trend + seasonal + residual, all in exact integer cents.
        // Trend is a centered 7-row rolling mean over the DAILY aggregate
        // (the window input is one row per (series, day) — O(days) rows at
        // ANY corpus scale, so the per-series window can never become the
        // 100 TB funnel the raw events would); seasonal is the per-(series,
        // day-of-week) mean of the detrended values. Detrended values go
        // NEGATIVE, and Spark's DIV truncates where DuckDB's `//` floors —
        // the shift-by-C trick keeps every division non-negative (mean of
        // (x+C) = mean(x)+C exactly), so both engines floor identically.
        val C = 1000000000000L
        val v = eventsTable(s, d).select($"event_type",
          to_date($"ts").as("day"), (dec2($"value") * 100).cast(LongType).as("vc"))
        val daily = v.groupBy($"event_type", $"day").agg(sum($"vc").as("v_c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"day").rowsBetween(-3, 3)
        val dt = daily
          .withColumn("trend_c", idiv(sum($"v_c").over(w), count(lit(1)).over(w)))
          .withColumn("detrended", $"v_c" - $"trend_c")
          .withColumn("dow", dayofweek($"day").cast(LongType))
        val se = dt.groupBy($"event_type", $"dow")
          .agg((idiv(sum($"detrended" + C), count(lit(1))) - C).as("seasonal_c"))
        dt.join(broadcast(se), Seq("event_type", "dow"))
          .select($"event_type", $"day", $"v_c", $"trend_c", $"seasonal_c",
            ($"detrended" - $"seasonal_c").as("residual_c"))
          .orderBy($"event_type", $"day")
      },
      Some("""WITH v AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
            FROM events),
          daily AS (SELECT event_type, day, CAST(sum(vc) AS BIGINT) AS v_c
            FROM v GROUP BY 1, 2),
          tr AS (SELECT event_type, day, v_c,
              CAST(sum(v_c) OVER w AS BIGINT) // count(*) OVER w AS trend_c
            FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          dt AS (SELECT *, v_c - trend_c AS detrended,
              CAST(dayofweek(day) + 1 AS BIGINT) AS dow FROM tr),
          se AS (SELECT event_type, dow,
              CAST(sum(detrended + 1000000000000) AS BIGINT) // count(*)
                - 1000000000000 AS seasonal_c
            FROM dt GROUP BY 1, 2)
        SELECT dt.event_type, day, v_c, trend_c, seasonal_c,
          detrended - seasonal_c AS residual_c
        FROM dt JOIN se ON dt.event_type = se.event_type AND dt.dow = se.dow
        ORDER BY dt.event_type, day"""),
      "Additive seasonal decomposition per series (trend = centered 7-day " +
        "rolling mean of the daily aggregate, seasonal = per-dow mean of " +
        "detrended, residual = remainder), exact integer cents with the " +
        "shift-by-C floor-vs-trunc guard on negative detrended values."),

    "fk_integrity_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Referential-integrity audit across the star schema: orphan counts
        // for every FK edge, one row per relation — the cheap contract
        // check an ingest runs before anything downstream trusts a join.
        // Each check is a left-anti join (shuffled hash / broadcast under
        // AQE) feeding a count; a healthy snapshot reports zeros, and the
        // zeros are the assertion.
        def orphans(name: String, fact: DataFrame, dim: DataFrame,
            fk: String, pk: String): DataFrame =
          fact.select(col(fk)).join(dim.select(col(pk)),
              col(fk) === col(pk), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(name).as("fk_edge"), $"n_orphans")
        val li = table(s, d, "lineitem")
        orphans("lineitem->orders", li, table(s, d, "orders"), "l_orderkey", "o_orderkey")
          .unionByName(orphans("lineitem->part", li, table(s, d, "part"), "l_partkey", "p_partkey"))
          .unionByName(orphans("lineitem->supplier", li, table(s, d, "supplier"), "l_suppkey", "s_suppkey"))
          .unionByName(orphans("orders->customer", table(s, d, "orders"),
            table(s, d, "customer"), "o_custkey", "c_custkey"))
          .orderBy($"fk_edge")
      },
      Some("""SELECT 'lineitem->orders' AS fk_edge, count(*) AS n_orphans
          FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        UNION ALL SELECT 'lineitem->part', count(*)
          FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
        UNION ALL SELECT 'lineitem->supplier', count(*)
          FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
        UNION ALL SELECT 'orders->customer', count(*)
          FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        ORDER BY fk_edge"""),
      "Referential-integrity audit: per-FK-edge orphan counts via anti-join " +
        "aggregates — the star-schema contract check, one row per edge.")
  ) ++ Seq(

    "rfm_segmentation" -> Q(
      (s, d) => {
        import s.implicits._
        // RFM customer segmentation with NO single-task window: each
        // quartile rank comes from GlobalOrder's range-partitioned
        // zipWithIndex scan over the O(customers) aggregate (a global
        // ntile()/row_number() window would funnel every customer through
        // one task — the exact anti-pattern dict_encode already avoids).
        // Buckets are (4·rank) div n on the (metric, custkey)-total order,
        // which both engines replay as row_number arithmetic.
        val base = table(s, d, "orders").groupBy($"o_custkey").agg(
          max(unix_date($"o_orderdate".cast("date")).cast(LongType)).as("recency_d"),
          count(lit(1)).as("frequency"),
          moneyE(sum(dec2($"o_totalprice")), 2).as("monetary_c"))
        val n = lit(base.count())
        def bucket(metric: String, out: String)(df: DataFrame): DataFrame =
          graft.operators.GlobalOrder
            .withGlobalIndex(df, Seq(col(metric).asc, col("o_custkey").asc), "rk")
            .withColumn(out, idiv(lit(4L) * col("rk"), n) + 1L)
            .drop("rk")
        val ranked = bucket("monetary_c", "m_bucket")(
          bucket("frequency", "f_bucket")(
            bucket("recency_d", "r_bucket")(base)))
        ranked
          .withColumn("segment", concat(lit("R"), $"r_bucket",
            lit("F"), $"f_bucket", lit("M"), $"m_bucket"))
          .select($"o_custkey", $"recency_d", $"frequency", $"monetary_c",
            $"r_bucket", $"f_bucket", $"m_bucket", $"segment")
          .orderBy($"o_custkey")
      },
      Some(s"""WITH base AS (SELECT o_custkey,
            CAST(max(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS recency_d,
            count(*) AS frequency,
            ${moneyESql("sum(CAST(o_totalprice AS DECIMAL(18,2)))", 2)} AS monetary_c
          FROM orders GROUP BY 1),
        n AS (SELECT count(*) AS n FROM base),
        rk AS (SELECT base.*,
            (4 * (row_number() OVER (ORDER BY recency_d, o_custkey) - 1)) // n.n + 1 AS r_bucket,
            (4 * (row_number() OVER (ORDER BY frequency, o_custkey) - 1)) // n.n + 1 AS f_bucket,
            (4 * (row_number() OVER (ORDER BY monetary_c, o_custkey) - 1)) // n.n + 1 AS m_bucket
          FROM base, n)
        SELECT o_custkey, recency_d, frequency, monetary_c,
          r_bucket, f_bucket, m_bucket,
          'R' || r_bucket || 'F' || f_bucket || 'M' || m_bucket AS segment
        FROM rk ORDER BY o_custkey"""),
      "RFM quartile segmentation: three GlobalOrder distributed ranks over " +
        "the customer aggregate (no one-task ntile window), (4·rank) div n " +
        "buckets, engine-portable total orders."),

    "ab_welch_t" -> Q(
      (s, d) => {
        import s.implicits._
        // Daily A/B comparison (treatment = click, control = view): the
        // Welch t statistic from integer sufficient statistics — every sum
        // is a BIGINT, and the doubles appear only in the FINAL fixed
        // sequence of IEEE ops both engines execute identically on
        // identical integers (the autocorr_lags discipline). Magnitude
        // bound: n·Σx² stays under 2⁵³ (double-exact) up to ~10⁶ events
        // per (day, arm) — past that, pre-scale the cents.
        val v = eventsTable(s, d)
          .filter($"event_type".isin("click", "view"))
          .select(micros(date_trunc("day", $"ts")).as("day_us"),
            $"event_type", (dec2($"value") * 100).cast(LongType).as("vc"))
        val st = v.groupBy($"day_us").pivot("event_type", Seq("click", "view"))
          .agg(count(lit(1)).as("n"), sum($"vc").as("s"),
            sum($"vc" * $"vc").as("ss"))
        val (n1, s1, ss1) = ($"click_n", $"click_s", $"click_ss")
        val (n2, s2, ss2) = ($"view_n", $"view_s", $"view_ss")
        def dd(c: org.apache.spark.sql.Column) = c.cast("double")
        val var1 = (dd(n1) * dd(ss1) - dd(s1) * dd(s1)) / (dd(n1) * (dd(n1) - 1.0))
        val var2 = (dd(n2) * dd(ss2) - dd(s2) * dd(s2)) / (dd(n2) * (dd(n2) - 1.0))
        st.filter(n1 > 1 && n2 > 1)
          .withColumn("t_stat",
            (dd(s1) / dd(n1) - dd(s2) / dd(n2)) /
              sqrt(var1 / dd(n1) + var2 / dd(n2)))
          .select($"day_us", n1.as("n_treat"), n2.as("n_ctrl"), $"t_stat")
          .orderBy($"day_us")
      },
      Some("""WITH v AS (SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
            FROM events WHERE event_type IN ('click', 'view')),
          g AS (SELECT day_us,
              count(*) FILTER (event_type = 'click') AS n1,
              CAST(coalesce(sum(vc) FILTER (event_type = 'click'), 0) AS BIGINT) AS s1,
              CAST(coalesce(sum(vc * vc) FILTER (event_type = 'click'), 0) AS BIGINT) AS ss1,
              count(*) FILTER (event_type = 'view') AS n2,
              CAST(coalesce(sum(vc) FILTER (event_type = 'view'), 0) AS BIGINT) AS s2,
              CAST(coalesce(sum(vc * vc) FILTER (event_type = 'view'), 0) AS BIGINT) AS ss2
            FROM v GROUP BY 1)
        SELECT day_us, n1 AS n_treat, n2 AS n_ctrl,
          (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
          / sqrt((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                 + (CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                   / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
          AS t_stat
        FROM g WHERE n1 > 1 AND n2 > 1 ORDER BY day_us"""),
      "Daily Welch t-test from integer sufficient statistics: BIGINT sums, " +
        "doubles only in the final identical IEEE sequence — the " +
        "autocorr_lags discipline applied to A/B comparison."),

    "clamped_running_balance" -> Q(
      (s, d) => {
        import s.implicits._
        // Inventory-style clamped running balance per user: purchases debit,
        // everything else credits, and the balance floors at zero — a fold
        // NO window sum expresses (the clamp makes it order-sensitive and
        // non-linear). Per-key sequential fold over the user's ordered
        // history: collect_list + array_sort + aggregate() on the engine,
        // list_reduce on the mirror. Per-key history length is the scale
        // bound, exactly like any sessionizer; keys are independent.
        val v = eventsTable(s, d).select($"user_id",
          struct(micros($"ts").as("ts_us"), $"event_id",
            when($"event_type" === "purchase", -(dec2($"value") * 100).cast(LongType))
              .otherwise((dec2($"value") * 100).cast(LongType)).as("delta"))
            .as("e"))
        v.groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            array_sort(collect_list($"e")).as("es"))
          .withColumn("final_balance_c",
            aggregate(transform($"es", e => e.getField("delta")),
              lit(0L), (acc, x) => greatest(acc + x, lit(0L))))
          .select($"user_id", $"n_events", $"final_balance_c")
          .orderBy($"user_id")
      },
      Some("""WITH v AS (SELECT user_id, ts, event_id,
              CASE WHEN event_type = 'purchase'
                THEN -CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END AS delta
            FROM events)
        SELECT user_id, count(*) AS n_events,
          list_reduce(list_prepend(CAST(0 AS BIGINT), list(delta ORDER BY ts, event_id)),
            (acc, x) -> greatest(acc + x, 0)) AS final_balance_c
        FROM v GROUP BY 1 ORDER BY user_id"""),
      "Zero-clamped running balance per user (order-sensitive non-linear " +
        "fold no window sum expresses): sorted per-key fold, " +
        "aggregate() ≡ list_reduce."),

    "column_profile" -> Q(
      (s, d) => {
        import s.implicits._
        // Dataset profiling: per-column row/null/distinct counts over the
        // events table in ONE logical pass (Spark expands the multi-
        // countDistinct internally; the scale path swaps countDistinct for
        // approx_count_distinct with zero shape change). The profile is
        // what a schema-drift monitor alerts on.
        val ev = eventsTable(s, d).select($"event_id", micros($"ts").as("ts_us"),
          $"user_id", $"event_type", $"value", $"props")
        val cols = Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")
        val agg = ev.agg(count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(
            count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"))): _*)
        agg.select(explode(array(cols.map(c => struct(
            lit(c).as("column_name"), $"n_rows",
            ($"n_rows" - col(s"nn_$c")).as("n_nulls"),
            col(s"nd_$c").as("n_distinct"))): _*)).as("p"))
          .select($"p.column_name", $"p.n_rows", $"p.n_nulls", $"p.n_distinct")
          .orderBy($"column_name")
      },
      Some("""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
            event_type, value, props FROM events)
        SELECT 'event_id' AS column_name, count(*) AS n_rows,
            count(*) - count(event_id) AS n_nulls, count(DISTINCT event_id) AS n_distinct FROM ev
        UNION ALL SELECT 'ts_us', count(*), count(*) - count(ts_us), count(DISTINCT ts_us) FROM ev
        UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id), count(DISTINCT user_id) FROM ev
        UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type), count(DISTINCT event_type) FROM ev
        UNION ALL SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value) FROM ev
        UNION ALL SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props) FROM ev
        ORDER BY column_name"""),
      "Per-column profile (rows/nulls/distincts) in one logical pass — the " +
        "schema-drift monitor's input; approx_count_distinct is the " +
        "zero-shape-change scale path.")
  ) ++ Seq(

    "histogram_drift_tvd" -> Q(
      (s, d) => {
        import s.implicits._
        // Distribution-drift monitor: total-variation distance between the
        // first week's value histogram and the rest, per series. TV is the
        // log-free drift statistic (PSI needs ln): with common denominators
        //   TV = Σ|n1_i·N2 − n2_i·N1| / (2·N1·N2)
        // every term is integer and the single floor happens at the end.
        // Shapes: one (type, band) aggregate, O(types) totals joined back
        // broadcast, one O(types·bands) reduce. Products cross 2⁶³ around
        // 10⁵ rows/slice — DECIMAL(38,0)/HUGEINT from the start.
        val d38 = DecimalType(38, 0)
        val cut = lit("2024-01-08").cast(TimestampType)
        val v = eventsTable(s, d).select($"event_type",
          least(idiv((dec2($"value") * 100).cast(LongType), lit(5000L)), lit(9L)).as("band"),
          when($"ts" < cut, 1L).otherwise(0L).as("in_a"))
        val h = v.groupBy($"event_type", $"band").agg(
          sum($"in_a").as("n_a"), sum(lit(1L) - $"in_a").as("n_b"))
        val t = h.groupBy($"event_type").agg(
          sum($"n_a").as("tot_a"), sum($"n_b").as("tot_b"))
        h.join(broadcast(t), "event_type")
          .groupBy($"event_type").agg(
            max($"tot_a").as("n_week1"), max($"tot_b").as("n_rest"),
            sum(abs($"n_a".cast(d38) * $"tot_b" - $"n_b".cast(d38) * $"tot_a")).as("num"))
          .withColumn("tvd_e6", idiv(lit(1000000L).cast(d38) * $"num",
            lit(2L).cast(d38) * $"n_week1" * $"n_rest"))
          .select($"event_type", $"n_week1", $"n_rest", $"tvd_e6")
          .orderBy($"event_type")
      },
      Some("""WITH v AS (SELECT event_type,
              least((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) // 5000, 9) AS band,
              CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END AS in_a
            FROM events),
          h AS (SELECT event_type, band, CAST(sum(in_a) AS BIGINT) AS n_a,
              CAST(sum(1 - in_a) AS BIGINT) AS n_b FROM v GROUP BY 1, 2),
          t AS (SELECT event_type, CAST(sum(n_a) AS BIGINT) AS tot_a,
              CAST(sum(n_b) AS BIGINT) AS tot_b FROM h GROUP BY 1)
        SELECT h.event_type, max(tot_a) AS n_week1, max(tot_b) AS n_rest,
          CAST((1000000 * sum(abs(CAST(n_a AS HUGEINT) * tot_b - CAST(n_b AS HUGEINT) * tot_a)))
               // (2 * CAST(max(tot_a) AS HUGEINT) * max(tot_b)) AS BIGINT) AS tvd_e6
        FROM h JOIN t ON h.event_type = t.event_type
        GROUP BY 1 ORDER BY h.event_type"""),
      "Histogram drift as total-variation distance (the log-free PSI " +
        "stand-in): common-denominator integer form, one floor at the end, " +
        "DECIMAL(38,0)/HUGEINT products."),

    "chi2_independence" -> Q(
      (s, d) => {
        import s.implicits._
        // Independence audit of (event_type × day-of-week): the χ²
        // statistic with every cell multiplied through to integers —
        //   cell_e6 = 10⁶·(O·N − R·C)² div (N·R·C)
        // floored PER CELL then summed (well-defined identically on both
        // engines; the e6 scale makes the per-cell floor loss ≤ 10⁻⁶ of a
        // unit). O·N and R·C cross 2⁶³ immediately at scale: DECIMAL(38,0)/
        // HUGEINT. One contingency aggregate + two marginal reductions,
        // all broadcast-sized.
        val d38 = DecimalType(38, 0)
        val cells = eventsTable(s, d)
          .groupBy($"event_type", dayofweek($"ts").cast(LongType).as("dow"))
          .agg(count(lit(1)).as("o"))
        val rows = cells.groupBy($"event_type").agg(sum($"o").as("r"))
        val colsM = cells.groupBy($"dow").agg(sum($"o").as("c"))
        val n = cells.agg(sum($"o").as("n"))
        cells.join(broadcast(rows), "event_type")
          .join(broadcast(colsM), "dow")
          .crossJoin(broadcast(n))
          .withColumn("dev", $"o".cast(d38) * $"n" - $"r".cast(d38) * $"c")
          .withColumn("cell_e6",
            idiv(lit(1000000L).cast(d38) * $"dev" * $"dev",
              $"n".cast(d38) * $"r" * $"c"))
          .agg(count(lit(1)).as("n_cells"),
            ((countDistinct($"event_type") - 1) * (countDistinct($"dow") - 1)).as("dof"),
            sum($"cell_e6").as("chi2_e6"))
          .select($"n_cells", $"dof", $"chi2_e6")
      },
      Some("""WITH cells AS (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
              count(*) AS o FROM events GROUP BY 1, 2),
          r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
          c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
          n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
          z AS (SELECT cells.event_type, cells.dow, o, r.r, c.c, n.n,
              CAST(o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c AS dev
            FROM cells JOIN r ON cells.event_type = r.event_type
              JOIN c ON cells.dow = c.dow, n)
        SELECT count(*) AS n_cells,
          (count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS dof,
          CAST(sum((1000000 * dev * dev) // (CAST(n AS HUGEINT) * r * c)) AS BIGINT) AS chi2_e6
        FROM z"""),
      "χ² independence audit (type × day-of-week): per-cell integer " +
        "(O·N−R·C)² div (N·R·C) floors summed — no expected-count " +
        "fractions, HUGEINT products, broadcast marginals."),

    "cramers_v2" -> Q(
      (s, d) => {
        import s.implicits._
        // Cramér's V² — the EFFECT-SIZE companion to chi2_independence
        // (the χ² statistic grows with N even for a fixed association;
        // V² = χ²/(N·min(r−1,c−1)) ∈ [0,1] is the size-free readout a
        // release gate actually thresholds). Same per-cell integer floors
        // as chi2_independence, then one more exact e6 quotient; emitted
        // squared (sqrt-free, the assortativity/spearman discipline).
        val d38 = DecimalType(38, 0)
        val cells = eventsTable(s, d)
          .groupBy($"event_type", dayofweek($"ts").cast(LongType).as("dow"))
          .agg(count(lit(1)).as("o"))
        val rows = cells.groupBy($"event_type").agg(sum($"o").as("r"))
        val colsM = cells.groupBy($"dow").agg(sum($"o").as("c"))
        val n = cells.agg(sum($"o").as("n"))
        cells.join(broadcast(rows), "event_type")
          .join(broadcast(colsM), "dow")
          .crossJoin(broadcast(n))
          .withColumn("dev", $"o".cast(d38) * $"n" - $"r".cast(d38) * $"c")
          .withColumn("cell_e6",
            idiv(lit(1000000L).cast(d38) * $"dev" * $"dev",
              $"n".cast(d38) * $"r" * $"c"))
          .agg(max($"n").as("n"),
            least(countDistinct($"event_type") - 1, countDistinct($"dow") - 1).as("m"),
            sum($"cell_e6").as("chi2_e6"))
          .select($"n", $"m", $"chi2_e6",
            idiv($"chi2_e6".cast(d38), $"n".cast(d38) * $"m".cast(d38))
              .cast(LongType).as("v2_e6"))
      },
      Some("""WITH cells AS (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
              count(*) AS o FROM events GROUP BY 1, 2),
          r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
          c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
          n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
          z AS (SELECT cells.event_type, cells.dow, o, r.r, c.c, n.n,
              CAST(o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c AS dev
            FROM cells JOIN r ON cells.event_type = r.event_type
              JOIN c ON cells.dow = c.dow, n),
          agg AS (SELECT max(n) AS n,
              least(count(DISTINCT event_type) - 1, count(DISTINCT dow) - 1) AS m,
              CAST(sum((1000000 * dev * dev) // (CAST(n AS HUGEINT) * r * c)) AS BIGINT) AS chi2_e6
            FROM z)
        SELECT n, CAST(m AS BIGINT) AS m, chi2_e6,
          CAST(CAST(chi2_e6 AS HUGEINT) // (CAST(n AS HUGEINT) * m) AS BIGINT) AS v2_e6
        FROM agg"""),
      "Cramér's V² effect size (χ²/(N·min(r−1,c−1)), sqrt-free e6): the " +
        "size-free association readout over the chi2_independence cells."),

    "kruskal_wallis" -> Q(
      (s, d) => {
        import s.implicits._
        // Kruskal-Wallis H — the k-GROUP generalization of mann_whitney_u
        // (arms = event types), completing the rank-test family the way
        // anova_oneway completes ab_welch_t. Doubled tie-averaged ranks
        // stay integral (2·avgrank = 2·cum_before + cnt + 1); the rank
        // table is O(distinct values) via one aggregate + PrefixSum (no
        // corpus-wide rank window). H = 12/(N(N+1))·ΣR_g²/n_g − 3(N+1)
        // with R_g = R2_g/2, evaluated as per-group FLOORED quotients
        // q_g = R2_g² div (4·n_g) then one floored e6 scale — the
        // anova_oneway mirrored-floor discipline (no tie correction;
        // both engines replay the identical floor order).
        val d38 = DecimalType(38, 0)
        val rows = eventsTable(s, d)
          .select($"event_type".as("arm"),
            (dec2($"value") * 100).cast(LongType).as("vc"))
        val byValArm = rows.groupBy($"vc", $"arm").agg(count(lit(1)).as("cnt_a"))
        val byVal = byValArm.groupBy($"vc").agg(sum($"cnt_a").as("cnt"))
          .withColumn("g", lit(0L))
        val cum = graft.operators.PrefixSum
          .groupedRunningTotal(byVal, Seq("g"), Seq(col("vc")), "cnt", "cumcnt")
          .withColumn("r2", lit(2L) * (col("cumcnt") - col("cnt")) + col("cnt") + 1L)
          .select($"vc", $"r2")
        val perArm = byValArm.join(cum, "vc")
          .groupBy($"arm")
          .agg(sum($"cnt_a").as("n_g"),
            sum($"cnt_a".cast(d38) * $"r2".cast(d38)).as("r2_g"))
          .withColumn("q_g", idiv($"r2_g" * $"r2_g", lit(4L).cast(d38) * $"n_g".cast(d38)))
        perArm.agg(count(lit(1)).as("k"), sum($"n_g").as("n"),
            sum($"q_g".cast(d38)).as("sq"))
          .select($"k", $"n",
            (idiv(lit(12000000L).cast(d38) * $"sq",
              $"n".cast(d38) * ($"n" + 1L).cast(d38)).cast(LongType)
              - lit(3000000L) * ($"n" + 1L)).as("h_e6"))
      },
      Some("""WITH r AS (SELECT event_type AS arm,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        w AS (SELECT arm,
            2 * rank() OVER (ORDER BY vc) + count(*) OVER (PARTITION BY vc) - 1 AS r2
          FROM r),
        a AS (SELECT arm, count(*) AS n_g,
            sum(CAST(r2 AS HUGEINT)) AS r2_g FROM w GROUP BY 1),
        q AS (SELECT n_g, (r2_g * r2_g) // (4 * CAST(n_g AS HUGEINT)) AS q_g FROM a),
        t AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
            sum(CAST(q_g AS HUGEINT)) AS sq FROM q)
        SELECT k, n,
          CAST((12000000 * sq) // (CAST(n AS HUGEINT) * (n + 1))
            - 3000000 * (n + 1) AS BIGINT) AS h_e6
        FROM t"""),
      "Kruskal-Wallis H (k-group rank test, e6 integer): doubled midranks " +
        "via O(distinct) PrefixSum rank table, per-group floored quotients " +
        "mirrored exactly — the non-parametric anova_oneway."),

    "logrank_test" -> Q(
      (s, d) => {
        import s.implicits._
        // Two-group LOG-RANK test — the inferential completion of the
        // survival family (survival_risk_table exposes the counts,
        // kaplan_meier_curve the estimate; this answers "do the two arms'
        // survival curves differ?"). Arms = user parity over the same
        // signup → first-purchase durations (right-censored at the corpus
        // horizon). Per distinct event day t: observed deaths split by arm
        // (d1, d), at-risk from BACKWARD cumulatives over the O(days)
        // aggregate (n1, n); hypergeometric terms as FLOORED e6 integers,
        // identical floor order on both engines:
        //   e1_t  = (10⁶·d·n1) div n
        //   a_t   = (10⁶·d·(n−d)) div (n−1)          [0 when n = 1]
        //   v_t   = (a_t·n1·(n−n1)) div n²           [two-stage: stays
        //           inside DECIMAL(38,0) to ~10¹² users where the naive
        //           single product crosses 10³⁸ near 10⁸]
        // z² = (O1−E1)²/V emitted as z2_e6 = (10⁶·O1 − E1_e6)² div V_e6.
        val d38 = DecimalType(38, 0)
        val day = 86400000000L
        val ev = eventsTable(s, d)
        val horizon = ev.agg(max(micros($"ts"))).head.getLong(0)
        val signup = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min(micros($"ts")).as("s0"))
        val firstBuy = ev.filter($"event_type" === "purchase")
          .select($"user_id", micros($"ts").as("pt"))
          .join(signup, "user_id").filter($"pt" >= $"s0")
          .groupBy($"user_id").agg(min($"pt").as("p0"))
        val durations = signup.join(firstBuy, Seq("user_id"), "left")
          .select(($"user_id" % 2).as("arm"),
            when($"p0".isNotNull, idiv($"p0" - $"s0", lit(day)))
              .otherwise(idiv(lit(horizon) - $"s0", lit(day))).as("t"),
            when($"p0".isNotNull, 1L).otherwise(0L).as("event"))
        val byDay = durations.groupBy($"t").agg(
          sum($"event").as("d"),
          sum(when($"arm" === 1L, $"event").otherwise(0L)).as("d1"),
          count(lit(1)).as("all_t"),
          sum(when($"arm" === 1L, 1L).otherwise(0L)).as("all1_t"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"t")
          .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val terms = byDay
          .withColumn("n", sum($"all_t").over(w))
          .withColumn("n1", sum($"all1_t").over(w))
          .filter($"d" > 0)
          .withColumn("e1_t", idiv(lit(1000000L).cast(d38) * $"d".cast(d38) * $"n1".cast(d38),
            $"n".cast(d38)))
          .withColumn("a_t", when($"n" > 1,
            idiv(lit(1000000L).cast(d38) * $"d".cast(d38) * ($"n" - $"d").cast(d38),
              ($"n" - 1L).cast(d38))).otherwise(lit(0L).cast(d38)))
          .withColumn("v_t", idiv($"a_t" * $"n1".cast(d38) * ($"n" - $"n1").cast(d38),
            $"n".cast(d38) * $"n".cast(d38)))
        terms.agg(sum($"d1").as("o1"),
            sum($"e1_t".cast(d38)).as("e1s"), sum($"v_t".cast(d38)).as("vs"))
          .select($"o1", $"e1s".cast(LongType).as("e1_e6"),
            $"vs".cast(LongType).as("v_e6"),
            when($"vs" === 0, lit(0L)).otherwise(
              idiv((lit(1000000L).cast(d38) * $"o1".cast(d38) - $"e1s")
                * (lit(1000000L).cast(d38) * $"o1".cast(d38) - $"e1s"), $"vs")
                .cast(LongType)).as("z2_e6"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
          hz AS (SELECT max(tsu) AS horizon FROM ev),
          su AS (SELECT user_id, min(tsu) AS s0 FROM ev
            WHERE event_type = 'signup' GROUP BY 1),
          fb AS (SELECT ev.user_id, min(tsu) AS p0 FROM ev JOIN su USING (user_id)
            WHERE event_type = 'purchase' AND tsu >= s0 GROUP BY 1),
          dur AS (SELECT su.user_id % 2 AS arm,
              CASE WHEN p0 IS NOT NULL THEN (p0 - s0) // 86400000000
                ELSE ((SELECT horizon FROM hz) - s0) // 86400000000 END AS t,
              CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM su LEFT JOIN fb ON su.user_id = fb.user_id),
          bd AS (SELECT t, CAST(sum(event) AS BIGINT) AS d,
              CAST(sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT) AS d1,
              count(*) AS all_t,
              CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS all1_t
            FROM dur GROUP BY 1),
          rk AS (SELECT *,
              CAST(sum(all_t) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS BIGINT) AS n,
              CAST(sum(all1_t) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1
            FROM bd),
          tm AS (SELECT d, d1, n, n1,
              (1000000 * CAST(d AS HUGEINT) * n1) // n AS e1_t,
              CASE WHEN n > 1 THEN (1000000 * CAST(d AS HUGEINT) * (n - d)) // (n - 1)
                ELSE 0 END AS a_t
            FROM rk WHERE d > 0),
          tm2 AS (SELECT d1, e1_t,
              (a_t * n1 * (n - n1)) // (CAST(n AS HUGEINT) * n) AS v_t
            FROM tm),
          agg AS (SELECT CAST(sum(d1) AS BIGINT) AS o1, sum(e1_t) AS e1s,
              sum(v_t) AS vs FROM tm2)
        SELECT o1, CAST(e1s AS BIGINT) AS e1_e6, CAST(vs AS BIGINT) AS v_e6,
          CAST(CASE WHEN vs = 0 THEN 0 ELSE
            ((1000000 * CAST(o1 AS HUGEINT) - e1s)
              * (1000000 * CAST(o1 AS HUGEINT) - e1s)) // vs END AS BIGINT) AS z2_e6
        FROM agg"""),
      "Two-group log-rank test over signup→purchase survival (parity arms): " +
        "per-event-day hypergeometric terms as mirrored floored-e6 integers " +
        "(two-stage variance product stays in DECIMAL(38,0)), z² emitted e6."),

    "ts_interpolate_linear" -> Q(
      (s, d) => {
        import s.implicits._
        // Linear interpolation over hourly series gaps — the companion to
        // gap_fill's forward-fill (forward-fill repeats; this draws the
        // line). Known points = a sparse deterministic subsample's hourly
        // sums; the spine explodes from per-series bounds; prev/next known
        // points come from two ignore-nulls windows (one sort per series —
        // series length is the scale bound). The interpolation
        //   v = v_prev + (Δv·(h−h_prev)) div (h_next−h_prev)
        // SIGN-SPLITS the division: Δv can be negative and floor (DuckDB
        // //) ≠ truncation (Spark DIV) there, so both engines only ever
        // divide non-negatives.
        val known = eventsTable(s, d)
          .filter($"event_id" % 23 === 0)
          .groupBy($"event_type",
            idiv(micros($"ts"), lit(3600000000L)).as("hr"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
        val spine = known.groupBy($"event_type")
          .agg(min($"hr").as("h0"), max($"hr").as("h1"))
          .select($"event_type", explode(sequence($"h0", $"h1")).as("hr"))
        val j = spine.join(known, Seq("event_type", "hr"), "left")
        val wPrev = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"hr")
          .rowsBetween(Long.MinValue, 0)
        val wNext = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"hr")
          .rowsBetween(0, Long.MaxValue)
        val prevHr = last(when($"v".isNotNull, $"hr"), ignoreNulls = true).over(wPrev)
        val prevV = last($"v", ignoreNulls = true).over(wPrev)
        val nextHr = first(when($"v".isNotNull, $"hr"), ignoreNulls = true).over(wNext)
        val nextV = first($"v", ignoreNulls = true).over(wNext)
        val num = (nextV - prevV) * ($"hr" - prevHr)
        val den = nextHr - prevHr
        val interp = prevV + when(num >= 0, idiv(num, den))
          .otherwise(-idiv(-num, den))
        j.select($"event_type", $"hr",
            when($"v".isNotNull, $"v").otherwise(interp).as("v_c"),
            $"v".isNull.as("is_interp"))
          .orderBy($"event_type", $"hr")
      },
      Some("""WITH known AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
              CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
            FROM events WHERE event_id % 23 = 0 GROUP BY 1, 2),
          b AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM known GROUP BY 1),
          g AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM b),
          j AS (SELECT g.event_type, g.hr, known.v FROM g
            LEFT JOIN known ON g.event_type = known.event_type AND g.hr = known.hr),
          w AS (SELECT event_type, hr, v,
              last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER wp AS prev_hr,
              last_value(v IGNORE NULLS) OVER wp AS prev_v,
              first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER wn AS next_hr,
              first_value(v IGNORE NULLS) OVER wn AS next_v
            FROM j WINDOW
              wp AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_type, hr,
          CASE WHEN v IS NOT NULL THEN v
            ELSE prev_v + CASE WHEN (next_v - prev_v) * (hr - prev_hr) >= 0
              THEN ((next_v - prev_v) * (hr - prev_hr)) // (next_hr - prev_hr)
              ELSE -((-((next_v - prev_v) * (hr - prev_hr))) // (next_hr - prev_hr)) END
          END AS v_c,
          v IS NULL AS is_interp
        FROM w ORDER BY event_type, hr"""),
      "Linear interpolation over hourly gaps (gap_fill draws a line, not a " +
        "step): ignore-nulls prev/next windows per series, sign-split " +
        "integer division — bit-exact on both engines.")
  ) ++ Seq(

    "quantile_normalize" -> Q(
      (s, d) => {
        import s.implicits._
        // Cross-distribution quantile normalization: each click value maps
        // to its EXACT percentile within the view (reference) distribution
        // — the drift-robust feature transform (percent_rank_normalize
        // ranks within one distribution; this ranks against another).
        // Distributed-exact composition of two existing operators: the
        // reference CDF is PrefixSum's two-job scan over the O(distinct
        // values) count table (NO single-task window), and the lookup is
        // the as-of join (greatest reference value ≤ x). percentile =
        // count(ref ≤ x)/N_ref, e6 floor; values below every reference
        // map to 0 via the left as-of + coalesce.
        val vc = (dec2($"value") * 100).cast(LongType)
        val ref = eventsTable(s, d).filter($"event_type" === "view")
          .select(vc.as("rv"))
        val refCnt = ref.groupBy($"rv").agg(count(lit(1)).as("c"))
          .withColumn("g", lit(0L))
        val cdf = graft.operators.PrefixSum
          .groupedRunningTotal(refCnt, Seq("g"), Seq($"rv"), "c", "cum")
          .select($"g", $"rv", $"cum")
        val nRef = lit(ref.count())
        val scored = eventsTable(s, d).filter($"event_type" === "click")
          .select($"event_id", vc.as("value_c")).withColumn("g", lit(0L))
        graft.operators.AsOfJoin
          .leftAsOf(scored, cdf, "g", "g", "value_c", "rv", Seq("cum"))
          .withColumn("pct_e6",
            idiv(lit(1000000L) * coalesce($"cum", lit(0L)), nRef))
          .select($"event_id", $"value_c", $"pct_e6")
          .orderBy($"event_id")
      },
      Some("""WITH ref AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS rv
            FROM events WHERE event_type = 'view'),
          n AS (SELECT count(*) AS nr FROM ref),
          rv AS (SELECT rv, count(*) AS c FROM ref GROUP BY 1),
          cdf AS (SELECT rv, CAST(sum(c) OVER (ORDER BY rv) AS BIGINT) AS cum FROM rv),
          cl AS (SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_c
            FROM events WHERE event_type = 'click')
        SELECT event_id, value_c,
          (1000000 * coalesce(cdf.cum, 0)) // (SELECT nr FROM n) AS pct_e6
        FROM cl ASOF LEFT JOIN cdf ON cl.value_c >= cdf.rv
        ORDER BY event_id"""),
      "Exact cross-distribution quantile transform: PrefixSum CDF over the " +
        "reference's distinct values (no one-task window) + as-of lookup — " +
        "count(ref ≤ x)/N in e6 integer arithmetic.")
  ) ++ Seq(

    "ewma_integer" -> Q(
      (s, d) => {
        import s.implicits._
        // Recursive exponential smoothing with rational α = 1/4 in pure
        // integers: l ← (3·l + x) div 4 per step. The PER-STEP floor makes
        // this genuinely fold-shaped — no closed form survives the
        // flooring (decayed_rolling_sum's window trick needs exact
        // geometric weights), so it runs as the ordered per-series fold
        // (collect+sort+aggregate ≡ list_reduce), values all non-negative
        // so floor = trunc. Emits the final smoothed level per series —
        // the state a forecaster would checkpoint.
        val hourly = eventsTable(s, d)
          .groupBy($"event_type", idiv(micros($"ts"), lit(3600000000L)).as("hr"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
        hourly.groupBy($"event_type")
          .agg(count(lit(1)).as("n_points"),
            array_sort(collect_list(struct($"hr", $"v"))).as("es"))
          .withColumn("ewma_c",
            aggregate(transform($"es", e => e.getField("v")),
              lit(0L), (acc, x) => idiv(lit(3L) * acc + x, lit(4L))))
          .select($"event_type", $"n_points", $"ewma_c")
          .orderBy($"event_type")
      },
      Some("""WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
              CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
            FROM events GROUP BY 1, 2)
        SELECT event_type, count(*) AS n_points,
          list_reduce(list_prepend(CAST(0 AS BIGINT), list(v ORDER BY hr)),
            (acc, x) -> (3 * acc + x) // 4) AS ewma_c
        FROM h GROUP BY 1 ORDER BY event_type"""),
      "Integer EWMA (α=1/4, per-step floor — genuinely fold-shaped, no " +
        "closed form): ordered per-series aggregate() ≡ list_reduce, final " +
        "smoothed level per series."),

    "pseudonymize_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Privacy-preserving analytics: user ids replaced by salted-hash
        // pseudonyms (stable within the release, unlinkable without the
        // pepper), and the per-pseudonym aggregates prove the analytics
        // survive the substitution. The 48-bit pseudonym space makes
        // accidental collisions detectable (n_users vs distinct
        // pseudonyms — a collision would silently merge two users'
        // histories); both engines lowercase-hex md5 identically.
        val p = substring(md5(concat(lit("pepper1:"), $"user_id".cast("string"))), 1, 12)
        eventsTable(s, d)
          .select(p.as("pseudonym"), (dec2($"value") * 100).cast(LongType).as("vc"))
          .groupBy($"pseudonym")
          .agg(count(lit(1)).as("n_events"), sum($"vc").as("sum_value_c"))
          .orderBy($"pseudonym")
      },
      Some("""SELECT substr(md5('pepper1:' || CAST(user_id AS VARCHAR)), 1, 12) AS pseudonym,
          count(*) AS n_events,
          CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events GROUP BY 1 ORDER BY pseudonym"""),
      "Salted-hash pseudonymization with per-pseudonym aggregates: stable " +
        "unlinkable ids, analytics intact — the release-side privacy " +
        "transform beside k_anonymity/l_diversity."),

    "vwap_bars" -> Q(
      (s, d) => {
        import s.implicits._
        // Volume-weighted average price per (month, returnflag): the bar
        // statistic OHLC doesn't carry. Sufficient statistics are integer —
        // numerator Σ price_c·qty in DECIMAL(38,0) (price_c ≤ 10⁷ cents ×
        // qty ≤ 10² per row; the BIGINT sum would saturate near 10 TB, the
        // decimal never does), denominator Σ qty in BIGINT — so the e2 floor
        // quotient is bit-identical on both engines. ONE hash aggregate with
        // map-side combine; no window, no second pass.
        val d38 = DecimalType(38, 0)
        val priceC = (dec2($"l_extendedprice") * 100).cast(LongType)
        val qty = $"l_quantity".cast(LongType)
        table(s, d, "lineitem")
          .select(date_trunc("month", $"l_shipdate").as("mon"), $"l_returnflag",
            (priceC * qty).cast(d38).as("pq"), qty.as("q"))
          .groupBy($"mon", $"l_returnflag")
          .agg(sum($"pq").as("num"), sum($"q").as("volume"),
            count(lit(1)).as("n_lines"))
          .select(micros($"mon").as("mon_us"), $"l_returnflag",
            idiv($"num", $"volume").as("vwap_c"), $"volume", $"n_lines")
          .orderBy($"mon_us", $"l_returnflag")
      },
      Some("""SELECT epoch_us(date_trunc('month', l_shipdate)) AS mon_us, l_returnflag,
          CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(l_quantity AS BIGINT) AS HUGEINT))
            // CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS BIGINT) AS vwap_c,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume,
          count(*) AS n_lines
        FROM lineitem GROUP BY 1, 2 ORDER BY mon_us, l_returnflag"""),
      "Volume-weighted average price bars per (month, returnflag): integer " +
        "sufficient statistics (DECIMAL(38,0) price x qty numerator, BIGINT " +
        "volume), one partial-aggregating shuffle, e2 floor quotient."),

    "max_drawdown" -> Q(
      (s, d) => {
        import s.implicits._
        // Per-user maximum drawdown of the cumulative event-value series:
        // running balance (cumsum in exact cents), running peak, drawdown =
        // peak − balance, then the per-user max. Two stacked windows over
        // the SAME (user_id, ts, event_id) sort — Spark plans them in one
        // sort + one window stage, so the cost is a single per-user
        // partition sort, the floor for any per-entity sequence statistic.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        eventsTable(s, d)
          .select($"user_id", $"ts", $"event_id",
            (dec2($"value") * 100).cast(LongType).as("vc"))
          .withColumn("bal", sum($"vc").over(w))
          .withColumn("peak", max($"bal").over(w))
          .groupBy($"user_id")
          .agg(max($"peak" - $"bal").as("max_drawdown_c"),
            max($"peak").as("peak_c"),
            count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH b AS (SELECT user_id, ts, event_id,
            sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
          FROM events),
          p AS (SELECT user_id, bal,
            max(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          FROM b)
        SELECT user_id, CAST(max(peak - bal) AS BIGINT) AS max_drawdown_c,
          CAST(max(peak) AS BIGINT) AS peak_c,
          count(*) AS n_events
        FROM p GROUP BY user_id ORDER BY user_id"""),
      "Per-user maximum drawdown (peak minus balance of the running cents " +
        "cumsum): two stacked windows sharing one per-user sort, then a " +
        "hash aggregate — the risk statistic beside clamped_running_balance."),

    "rolling_median" -> Q(
      (s, d) => {
        import s.implicits._
        // Exact rolling median of the last ≤10 event values per user. The
        // frame is ROWS-bounded (10), so per-row state is O(10) regardless
        // of corpus size; the only heavy step is the per-user sort every
        // sequence statistic shares. Emitted as TWICE the median in cents
        // (BIGINT): percentile-0.5 linear interpolation lands on integers
        // or exact halves, and 2x keeps the comparison in integer space —
        // no double columns for the driver to canonicalize.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
        eventsTable(s, d)
          .select($"user_id", $"ts", $"event_id",
            (dec2($"value") * 100).cast(LongType).as("vc"))
          .withColumn("med2_c",
            (expr("percentile(vc, 0.5)").over(w) * 2).cast(LongType))
          .select($"user_id", $"event_id", $"vc", $"med2_c")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
          CAST(2 * median(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS med2_c
        FROM events ORDER BY user_id, event_id"""),
      "Exact rolling median over a 10-row frame per user (percentile-0.5 " +
        "window agg ≡ DuckDB windowed median), emitted as 2x-median cents " +
        "BIGINT so even-frame halves stay integer-exact."),

    "equi_depth_histogram" -> Q(
      (s, d) => {
        import s.implicits._
        // Equi-depth (equal-frequency) 8-bucket histogram of order totals —
        // the optimizer-statistics shape where equal-WIDTH histograms
        // (event_value_histogram) mislead on skew. Bucket of the row at
        // global rank i (0-based, total order with orderkey tiebreak) is
        // (8·i) div N. The rank comes from GlobalOrder.withGlobalIndex —
        // range-exchange sort + per-partition offsets — NOT row_number()
        // over an empty partition, which would funnel 100 TB through one
        // task. N joins in as a broadcast one-row aggregate.
        val px = table(s, d, "orders")
          .select($"o_orderkey", (dec2($"o_totalprice") * 100).cast(LongType).as("pc"))
        val idx = graft.operators.GlobalOrder.withGlobalIndex(
          px, Seq(col("pc"), col("o_orderkey")), "idx")
        val n = px.agg(count(lit(1)).as("n"))
        idx.crossJoin(broadcast(n))
          .withColumn("bucket", idiv($"idx" * 8, $"n"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_rows"), min($"pc").as("lo_c"), max($"pc").as("hi_c"))
          .orderBy($"bucket")
      },
      Some("""WITH r AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
            row_number() OVER (ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                               o_orderkey) - 1 AS idx,
            count(*) OVER () AS n
          FROM orders)
        SELECT (8 * idx) // n AS bucket, count(*) AS n_rows,
          min(pc) AS lo_c, max(pc) AS hi_c
        FROM r GROUP BY 1 ORDER BY bucket"""),
      "Equi-depth 8-bucket histogram of order totals: distributed global " +
        "rank (range-exchange sort + per-partition offsets, no single-task " +
        "window), bucket = (8 x rank) div N with N broadcast."),

    "candidate_key_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Candidate-key discovery audit: for each proposed key column set,
        // one groupBy(key).count pass folded to (n_rows, n_groups,
        // dup_rows, max_group, is_key). Each candidate is an independent
        // single-shuffle aggregate — a 100 TB profiler runs them in one
        // scan via grouping sets when the candidates nest; these don't, so
        // the union of three partial-aggregating passes IS the minimal
        // shape, and no pass ever holds more than O(groups) state.
        val o = table(s, d, "orders")
        def audit(name: String, cols: Seq[String]): DataFrame =
          o.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
            .agg(sum($"c").as("n_rows"), count(lit(1)).as("n_groups"),
              sum($"c" - 1).as("dup_rows"), max($"c").as("max_group"))
            .select(lit(name).as("candidate"), $"n_rows", $"n_groups",
              $"dup_rows", $"max_group",
              ($"dup_rows" === 0L).cast(LongType).as("is_key"))
        audit("o_orderkey", Seq("o_orderkey"))
          .unionByName(audit("o_custkey", Seq("o_custkey")))
          .unionByName(audit("o_custkey,o_orderdate", Seq("o_custkey", "o_orderdate")))
          .orderBy($"candidate")
      },
      Some("""WITH a1 AS (SELECT count(*) AS c FROM orders GROUP BY o_orderkey),
          a2 AS (SELECT count(*) AS c FROM orders GROUP BY o_custkey),
          a3 AS (SELECT count(*) AS c FROM orders GROUP BY o_custkey, o_orderdate),
          f1 AS (SELECT 'o_orderkey' AS candidate, CAST(sum(c) AS BIGINT) AS n_rows,
              count(*) AS n_groups, CAST(sum(c - 1) AS BIGINT) AS dup_rows,
              max(c) AS max_group FROM a1),
          f2 AS (SELECT 'o_custkey', CAST(sum(c) AS BIGINT), count(*),
              CAST(sum(c - 1) AS BIGINT), max(c) FROM a2),
          f3 AS (SELECT 'o_custkey,o_orderdate', CAST(sum(c) AS BIGINT), count(*),
              CAST(sum(c - 1) AS BIGINT), max(c) FROM a3),
          u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
        SELECT candidate, n_rows, n_groups, dup_rows, max_group,
          CAST(CASE WHEN dup_rows = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_key
        FROM u ORDER BY candidate"""),
      "Candidate-key audit over proposed key column sets: per candidate one " +
        "groupBy-count pass folded to duplicate statistics and an is_key " +
        "verdict — the uniqueness half of a schema profiler."),

    "functional_dependency_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Functional-dependency audit X → Y: distinct (X, Y) pairs, then
        // per-X distinct-Y counts, folded to (n_lhs, n_violating,
        // max_rhs_per_lhs, holds). Two shuffles per FD (pair distinct is
        // the map-side-combinable heavy one); per-FD state is O(distinct
        // pairs), never O(rows). The three audited FDs deliberately mix
        // one that holds and two that don't — the audit's value is the
        // violation count, not a boolean.
        val li = table(s, d, "lineitem")
        def fd(name: String, x: String, y: String): DataFrame =
          li.select(col(x).as("lhs"), col(y).as("rhs")).distinct()
            .groupBy($"lhs").agg(count(lit(1)).as("nrhs"))
            .agg(count(lit(1)).as("n_lhs"),
              sum(($"nrhs" > 1L).cast(LongType)).as("n_violating"),
              max($"nrhs").as("max_rhs"))
            .select(lit(name).as("fd"), $"n_lhs", $"n_violating", $"max_rhs",
              ($"n_violating" === 0L).cast(LongType).as("holds"))
        fd("l_orderkey->l_returnflag", "l_orderkey", "l_returnflag")
          .unionByName(fd("l_partkey->l_suppkey", "l_partkey", "l_suppkey"))
          .unionByName(fd("l_orderkey->l_linestatus", "l_orderkey", "l_linestatus"))
          .orderBy($"fd")
      },
      Some("""WITH p1 AS (SELECT DISTINCT l_orderkey AS lhs, l_returnflag AS rhs FROM lineitem),
          p2 AS (SELECT DISTINCT l_partkey AS lhs, l_suppkey AS rhs FROM lineitem),
          p3 AS (SELECT DISTINCT l_orderkey AS lhs, l_linestatus AS rhs FROM lineitem),
          g1 AS (SELECT lhs, count(*) AS nrhs FROM p1 GROUP BY 1),
          g2 AS (SELECT lhs, count(*) AS nrhs FROM p2 GROUP BY 1),
          g3 AS (SELECT lhs, count(*) AS nrhs FROM p3 GROUP BY 1),
          f1 AS (SELECT 'l_orderkey->l_returnflag' AS fd, count(*) AS n_lhs,
              CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
              max(nrhs) AS max_rhs FROM g1),
          f2 AS (SELECT 'l_partkey->l_suppkey', count(*),
              CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT), max(nrhs) FROM g2),
          f3 AS (SELECT 'l_orderkey->l_linestatus', count(*),
              CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT), max(nrhs) FROM g3),
          u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
        SELECT fd, n_lhs, n_violating, max_rhs,
          CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
        FROM u ORDER BY fd"""),
      "Functional-dependency audit (X determines Y?): distinct-pair pass " +
        "then per-LHS distinct-RHS fold — violation counts and max RHS " +
        "multiplicity per dependency, the FD half of a schema profiler."),

    "t_closeness" -> Q(
      (s, d) => {
        import s.implicits._
        // t-closeness — the third release gate after k_anonymity (group
        // size) and l_diversity (distinct sensitive values): how far each
        // QI group's DISTRIBUTION over the ordered sensitive attribute
        // (account-balance band 0..9) sits from the global one, as the
        // ordered earth-mover's distance Σ|cumF_g − cumF| / (m−1). All
        // rational arithmetic stays integral — cum_g·N − cum_G·n_g in
        // DECIMAL(38,0) (the cross product overflows BIGINT once n_g·N
        // passes 9.2e18, i.e. at real corpus scale) and one e6 floor
        // division at the end. Shapes: one (QI, band) aggregate over the
        // data, then everything downstream is O(groups × 10 bands) — the
        // dense band grid comes from a broadcast 10-row cross join, the
        // cumsums are 10-row windows.
        val d38 = DecimalType(38, 0)
        val m = 10
        val banded = table(s, d, "customer")
          .select($"c_nationkey".cast(LongType).as("nat"), $"c_mktsegment".as("seg"),
            floor(($"c_acctbal" + 1000.0) / lit(1100.0)).cast(LongType).as("band"))
        val cnt = banded.groupBy($"nat", $"seg", $"band").agg(count(lit(1)).as("c"))
        val groups = cnt.select($"nat", $"seg").distinct()
          .join(cnt.groupBy($"nat", $"seg").agg(sum($"c").as("n_g")), Seq("nat", "seg"))
        val bands = banded.sparkSession.range(0, m).select($"id".as("band"))
        val glob = cnt.groupBy($"band").agg(sum($"c").as("cg"))
        val nTot = cnt.agg(sum($"c").as("n")) // one row, broadcast below
        val wg = org.apache.spark.sql.expressions.Window
          .partitionBy("nat", "seg").orderBy("band")
        val wG = org.apache.spark.sql.expressions.Window.orderBy("band")
        val dense = groups.crossJoin(broadcast(bands))
          .join(cnt, Seq("nat", "seg", "band"), "left")
          .withColumn("c", coalesce($"c", lit(0L)))
          .withColumn("cum_g", sum($"c").over(wg))
        val gcum = broadcast(glob
          .join(bands, Seq("band"), "right")
          .withColumn("cg", coalesce($"cg", lit(0L)))
          .withColumn("cum_all", sum($"cg").over(wG))
          .select($"band", $"cum_all"))
        dense.join(gcum, "band").crossJoin(broadcast(nTot))
          .filter($"band" < m - 1) // EMD sums the m-1 interior prefixes
          .withColumn("diff",
            abs($"cum_g".cast(d38) * $"n".cast(d38) - $"cum_all".cast(d38) * $"n_g".cast(d38)))
          .groupBy($"nat", $"seg", $"n_g", $"n")
          .agg(sum($"diff").as("emd_num"))
          .select($"nat", $"seg", $"n_g",
            idiv(lit(1000000L).cast(d38) * $"emd_num",
              $"n_g".cast(d38) * $"n".cast(d38) * lit(m - 1).cast(d38)).as("t_e6"))
          .withColumn("breach", ($"t_e6" > 200000L).cast(LongType))
          .orderBy($"nat", $"seg")
      },
      Some("""WITH b AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
            CAST(floor((c_acctbal + 1000.0) / 1100.0) AS BIGINT) AS band
          FROM customer),
        cnt AS (SELECT nat, seg, band, count(*) AS c FROM b GROUP BY 1, 2, 3),
        grp AS (SELECT nat, seg, CAST(sum(c) AS BIGINT) AS n_g FROM cnt GROUP BY 1, 2),
        bands AS (SELECT unnest(generate_series(0, 9)) AS band),
        dense AS (SELECT g.nat, g.seg, g.n_g, bd.band, coalesce(c.c, 0) AS c
          FROM grp g CROSS JOIN bands bd
          LEFT JOIN cnt c ON c.nat = g.nat AND c.seg = g.seg AND c.band = bd.band),
        cg AS (SELECT *, CAST(sum(c) OVER (PARTITION BY nat, seg ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g FROM dense),
        gl AS (SELECT bd.band, CAST(coalesce(sum(c.c), 0) AS BIGINT) AS cgl
          FROM bands bd LEFT JOIN cnt c ON c.band = bd.band GROUP BY 1),
        gcum AS (SELECT band, CAST(sum(cgl) OVER (ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all FROM gl),
        nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
        j AS (SELECT cgx.nat, cgx.seg, cgx.n_g, nt.n,
            abs(CAST(cgx.cum_g AS HUGEINT) * nt.n - CAST(gc.cum_all AS HUGEINT) * cgx.n_g) AS diff
          FROM cg cgx JOIN gcum gc ON cgx.band = gc.band, nt WHERE cgx.band < 9),
        e AS (SELECT nat, seg, n_g,
            CAST((1000000 * sum(diff)) // (CAST(n_g AS HUGEINT) * n * 9) AS BIGINT) AS t_e6
          FROM j GROUP BY nat, seg, n_g, n)
        SELECT nat, seg, n_g, t_e6,
          CAST(CASE WHEN t_e6 > 200000 THEN 1 ELSE 0 END AS BIGINT) AS breach
        FROM e ORDER BY nat, seg"""),
      "t-closeness release gate: ordered earth-mover's distance between " +
        "each QI group's sensitive-band distribution and the global one, " +
        "exact rational arithmetic in DECIMAL(38,0)/HUGEINT, e6 verdicts; " +
        "everything past one (QI, band) aggregate is O(groups x bands)."),

    "dp_noisy_counts" -> Q(
      (s, d) => {
        import s.implicits._
        // Differentially-private-release shape: per-nation counts with
        // additive integer noise and non-negativity clamp. The noise is a
        // SEEDED LCG on the group key — deterministic on both engines (a
        // real release swaps in calibrated Laplace draws; the sandbox
        // demands replayability, and the pipeline shape — aggregate, add
        // per-group noise, clamp, NEVER emit the true count — is what's
        // under test). One hash aggregate; noise is a per-GROUP scalar op.
        val noise = (lit(1103515245L) * $"c_nationkey".cast(LongType) + 12345L) % 2147483648L % 21L - 10L
        table(s, d, "customer")
          .groupBy($"c_nationkey".cast(LongType).as("c_nationkey"))
          .agg(count(lit(1)).as("true_c"))
          .select($"c_nationkey",
            greatest(lit(0L), $"true_c" + noise).as("noisy_count"))
          .orderBy($"c_nationkey")
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
          greatest(0, count(*) + (1103515245 * CAST(c_nationkey AS BIGINT) + 12345) % 2147483648 % 21 - 10) AS noisy_count
        FROM customer GROUP BY 1 ORDER BY 1"""),
      "Noisy-count release: per-group counts plus seeded integer noise " +
        "(deterministic LCG standing in for Laplace) with a non-negativity " +
        "clamp — the true count never leaves the aggregate."),

    "anova_twoway" -> Q(
      (s, d) => {
        import s.implicits._
        // TWO-WAY ANOVA with interaction (event_type × day-of-week — does
        // mean spend differ by series, by weekday, and does the weekday
        // effect differ BETWEEN series?): the factorial companion to
        // anova_oneway. One shuffle builds the 35 (a,b) CELL sufficient
        // statistics (n, ΣX, ΣX²); every marginal and the grand total
        // derive from the cells, so the corpus is scanned once. All
        // quotient terms are PER-GROUP FLOORED (mirrored exactly by the
        // oracle) with the same BIGINT-narrowing guard as anova_oneway,
        // products in DECIMAL(38,0)/HUGEINT; F statistics are e6
        // cross-multiplied floors.
        val d38 = DecimalType(38, 0)
        val v = eventsTable(s, d).select($"event_type".as("a"),
          dayofweek($"ts").cast(LongType).as("b"),
          (dec2($"value") * 100).cast(LongType).as("vc"))
        val cells = v.groupBy($"a", $"b")
          .agg(count(lit(1)).as("n"), sum($"vc").as("sv"),
            sum($"vc".cast(d38) * $"vc".cast(d38)).as("ssq"))
        // guarded floor(S²/n): Spark's IntegralDivide narrows to BIGINT,
        // so a quotient past Long.MaxValue must raise, not NULL out
        def qterm(sCol: org.apache.spark.sql.Column,
            nCol: org.apache.spark.sql.Column, what: String) = {
          val s2 = sCol.cast(d38) * sCol.cast(d38)
          val guarded = when(s2 > lit(Long.MaxValue).cast(d38) * nCol.cast(d38),
            raise_error(concat(lit(s"anova_twoway: $what S^2/n overflows BIGINT: "),
              s2.cast("string")))).otherwise(s2)
          idiv(guarded, nCol.cast(d38)).cast(d38)
        }
        val byA = cells.groupBy($"a").agg(sum($"n").as("n"), sum($"sv").as("sv"))
          .agg(count(lit(1)).as("ka"), sum(qterm($"sv", $"n", "factor-A")).as("ta"))
        val byB = cells.groupBy($"b").agg(sum($"n").as("n"), sum($"sv").as("sv"))
          .agg(count(lit(1)).as("kb"), sum(qterm($"sv", $"n", "factor-B")).as("tb"))
        val byAB = cells
          .agg(count(lit(1)).as("kab"), sum(qterm($"sv", $"n", "cell")).as("tab"),
            sum($"n").as("n"), sum($"sv").as("sv"), sum($"ssq").as("ssq"))
        val joined = byAB.crossJoin(byA).crossJoin(byB)
          .withColumn("c", qterm($"sv", $"n", "grand"))
        def toL(c: org.apache.spark.sql.Column, name: String) =
          when(abs(c) > lit(Long.MaxValue), raise_error(concat(
            lit(s"anova_twoway: $name overflows BIGINT: "), c.cast("string"))))
            .otherwise(c).cast("long")
        val withSS = joined.select(
          $"ka", $"kb", $"n",
          toL($"ta" - $"c", "ssa").as("ssa_c2"),
          toL($"tb" - $"c", "ssb").as("ssb_c2"),
          toL($"tab" - $"ta" - $"tb" + $"c", "ssab").as("ssab_c2"),
          toL($"ssq" - $"tab", "sse").as("sse_c2"))
        def f(ss: org.apache.spark.sql.Column, df1: org.apache.spark.sql.Column,
            sse: org.apache.spark.sql.Column, df2: org.apache.spark.sql.Column) =
          idiv(lit(1000000L).cast(d38) * ss.cast(d38) * df2.cast(d38),
            greatest(sse.cast(d38) * df1.cast(d38), lit(1L).cast(d38))).cast("long")
        withSS.select($"ka", $"kb", $"n", $"ssa_c2", $"ssb_c2", $"ssab_c2", $"sse_c2",
          f($"ssa_c2", $"ka" - 1, $"sse_c2",
            $"n" - $"ka" * $"kb").as("fa_e6"),
          f($"ssb_c2", $"kb" - 1, $"sse_c2",
            $"n" - $"ka" * $"kb").as("fb_e6"),
          f($"ssab_c2", ($"ka" - 1) * ($"kb" - 1), $"sse_c2",
            $"n" - $"ka" * $"kb").as("fab_e6"))
      },
      Some("""WITH v AS (SELECT event_type AS a, CAST(dayofweek(ts) + 1 AS BIGINT) AS b,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        cells AS (SELECT a, b, count(*) AS n, CAST(sum(vc) AS BIGINT) AS sv,
            sum(CAST(vc AS HUGEINT) * vc) AS ssq
          FROM v GROUP BY 1, 2),
        ma AS (SELECT count(*) AS ka,
            sum((CAST(sv AS HUGEINT) * sv) // n) AS ta
          FROM (SELECT a, CAST(sum(n) AS BIGINT) AS n, CAST(sum(sv) AS BIGINT) AS sv
                FROM cells GROUP BY a)),
        mb AS (SELECT count(*) AS kb,
            sum((CAST(sv AS HUGEINT) * sv) // n) AS tb
          FROM (SELECT b, CAST(sum(n) AS BIGINT) AS n, CAST(sum(sv) AS BIGINT) AS sv
                FROM cells GROUP BY b)),
        mab AS (SELECT count(*) AS kab,
            sum((CAST(sv AS HUGEINT) * sv) // n) AS tab,
            CAST(sum(n) AS BIGINT) AS n, CAST(sum(sv) AS BIGINT) AS sv,
            sum(ssq) AS ssq
          FROM cells),
        t AS (SELECT *, (CAST(sv AS HUGEINT) * sv) // n AS c FROM mab, ma, mb),
        ss AS (SELECT ka, kb, n,
            CAST(ta - c AS BIGINT) AS ssa_c2,
            CAST(tb - c AS BIGINT) AS ssb_c2,
            CAST(tab - ta - tb + c AS BIGINT) AS ssab_c2,
            CAST(ssq - tab AS BIGINT) AS sse_c2
          FROM t)
        SELECT ka, kb, n, ssa_c2, ssb_c2, ssab_c2, sse_c2,
          CAST((1000000 * CAST(ssa_c2 AS HUGEINT) * (n - ka * kb))
            // greatest(CAST(sse_c2 AS HUGEINT) * (ka - 1), 1) AS BIGINT) AS fa_e6,
          CAST((1000000 * CAST(ssb_c2 AS HUGEINT) * (n - ka * kb))
            // greatest(CAST(sse_c2 AS HUGEINT) * (kb - 1), 1) AS BIGINT) AS fb_e6,
          CAST((1000000 * CAST(ssab_c2 AS HUGEINT) * (n - ka * kb))
            // greatest(CAST(sse_c2 AS HUGEINT) * ((ka - 1) * (kb - 1)), 1) AS BIGINT) AS fab_e6
        FROM ss"""),
      "Two-way ANOVA with interaction (event_type × weekday) from one pass " +
        "of (a,b)-cell integer sufficient statistics: floored marginal/cell " +
        "quotients mirrored exactly, e6 cross-multiplied F for both factors " +
        "and the interaction."),

    "conversion_latency_quantiles" -> Q(
      (s, d) => {
        import s.implicits._
        // EXACT conversion-latency quantiles by signup cohort: per user
        // the first-view → first-qualifying-purchase latency (the funnel
        // frame), then P50/P90 by rank selection inside each cohort week
        // — the "how long does converting actually take, and is it
        // drifting by cohort" product question, with the exact-quantile
        // discipline (lower-index pick at fractional ranks) instead of a
        // float percentile_approx. Windows partition by cohort (O(users)
        // rows after the per-user aggregate), never the raw log.
        val wk = 7L * 86400000000L
        val ev = eventsTable(s, d).select($"user_id", $"event_type", micros($"ts").as("us"))
        val viewed = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"us").as("t_view"))
        val converted = ev.filter($"event_type" === "purchase")
          .join(viewed, "user_id").filter($"us" > $"t_view")
          .groupBy($"user_id").agg(min($"us").as("t_conv"), min($"t_view").as("t_view0"))
          .select($"user_id", idiv($"t_view0", lit(wk)).as("cohort_week"),
            ($"t_conv" - $"t_view0").as("lat_us"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"cohort_week").orderBy($"lat_us", $"user_id")
        converted
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"cohort_week")))
          .groupBy($"cohort_week")
          .agg(max($"n").as("n_converted"),
            max(when($"rn" === lit(1L) + idiv(($"n" - 1L) * 50L, lit(100L)), $"lat_us"))
              .as("p50_lat_us"),
            max(when($"rn" === lit(1L) + idiv(($"n" - 1L) * 90L, lit(100L)), $"lat_us"))
              .as("p90_lat_us"))
          .orderBy($"cohort_week")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        v AS (SELECT user_id, min(us) AS t_view FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.us) AS t_conv, min(v.t_view) AS t_view0
          FROM ev e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.us > v.t_view
          GROUP BY e.user_id),
        lat AS (SELECT user_id, t_view0 // 604800000000 AS cohort_week,
            t_conv - t_view0 AS lat_us FROM c),
        r AS (SELECT *, row_number() OVER (PARTITION BY cohort_week
              ORDER BY lat_us, user_id) AS rn,
            count(*) OVER (PARTITION BY cohort_week) AS n
          FROM lat)
        SELECT cohort_week, CAST(max(n) AS BIGINT) AS n_converted,
          max(CASE WHEN rn = 1 + ((n - 1) * 50) // 100 THEN lat_us END) AS p50_lat_us,
          max(CASE WHEN rn = 1 + ((n - 1) * 90) // 100 THEN lat_us END) AS p90_lat_us
        FROM r GROUP BY cohort_week ORDER BY cohort_week"""),
      "Exact P50/P90 view→purchase conversion latency by signup cohort week " +
        "(rank-selected quantiles over the per-user funnel frame, windows " +
        "over cohort-sized partitions only)."),

    "winsorized_stats" -> Q(
      (s, d) => {
        import s.implicits._
        // WINSORIZED per-series stats — the CLAMP companion to
        // outlier_trim's drop: values below the exact P5 (or above the
        // exact P95) move TO the fence instead of leaving the sample, so n
        // is preserved (the estimator regulators prefer when every
        // observation must stay accounted for). Exact integer fences by
        // rank selection (lower-index pick at fractional ranks — the
        // event_value_quantiles discipline), clamped integer sums, e6
        // floored means. Two passes over the series: one rank window to
        // select fences, one clamped aggregate.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"vc", $"event_id")
        val v = eventsTable(s, d).select($"event_type", $"event_id",
          (dec2($"value") * 100).cast(LongType).as("vc"))
        val ranked = v.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"event_type")))
        // fence index = 1 + trunc((n-1)*q): the lower-index exact pick
        val fences = ranked
          .groupBy($"event_type")
          .agg(
            max(when($"rn" === lit(1L) + idiv(($"n" - 1L) * 5L, lit(100L)), $"vc"))
              .as("p5_c"),
            max(when($"rn" === lit(1L) + idiv(($"n" - 1L) * 95L, lit(100L)), $"vc"))
              .as("p95_c"))
        v.join(fences, "event_type")
          .withColumn("wc", greatest(least($"vc", $"p95_c"), $"p5_c"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), max($"p5_c").as("p5_c"),
            max($"p95_c").as("p95_c"),
            sum($"wc").as("wsum_c"),
            idiv(lit(1000000L) * sum($"wc"), count(lit(1))).as("wmean_e6"))
          .orderBy($"event_type")
      },
      Some("""WITH v AS (SELECT event_type, event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY vc, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        f AS (SELECT event_type,
            max(CASE WHEN rn = 1 + ((n - 1) * 5) // 100 THEN vc END) AS p5_c,
            max(CASE WHEN rn = 1 + ((n - 1) * 95) // 100 THEN vc END) AS p95_c
          FROM r GROUP BY event_type)
        SELECT v.event_type, count(*) AS n, max(f.p5_c) AS p5_c,
          max(f.p95_c) AS p95_c,
          CAST(sum(greatest(least(v.vc, f.p95_c), f.p5_c)) AS BIGINT) AS wsum_c,
          (1000000 * CAST(sum(greatest(least(v.vc, f.p95_c), f.p5_c)) AS BIGINT))
            // count(*) AS wmean_e6
        FROM v JOIN f ON v.event_type = f.event_type
        GROUP BY v.event_type ORDER BY v.event_type"""),
      "Winsorized per-series stats: exact rank-selected P5/P95 fences, " +
        "values clamp to the fences (n preserved) — the clamp companion to " +
        "outlier_trim's drop; two passes, per-series windows only."),

    "ftl_policy_replay" -> Q(
      (s, d) => {
        import s.implicits._
        // ONLINE-LEARNING REPLAY (full-information follow-the-leader): per
        // day the FTL policy plays the arm (event_type) with the best
        // e12-quantized PREFIX mean daily spend through YESTERDAY
        // (truncating division, engine-identical; (qmean, arm) tiebreak),
        // then realizes that arm's ACTUAL mean today — against the
        // best-fixed-arm-in-hindsight baseline, the cumulative gap is the
        // policy's regret curve. Everything is prefix aggregates over the
        // (day, arm) grid (windows over O(days) partitions) — the
        // observed-rewards state never depends on the policy's choices,
        // which is exactly what makes full-information FTL replayable in
        // one pass where a true bandit replay is sequential.
        val dayUs = 86400000000L
        val grid = eventsTable(s, d)
          .select($"event_type".as("arm"), idiv(micros($"ts"), lit(dayUs)).as("dd"),
            (dec2($"value") * 100).cast(LongType).as("vc"))
          .groupBy($"arm", $"dd")
          .agg(sum($"vc").as("sv"), count(lit(1)).as("n"))
          // today's realized reward: the arm's e6-floored mean of the day
          .withColumn("reward_e6", idiv(lit(1000000L).cast(DecimalType(38, 0)) *
            $"sv".cast(DecimalType(38, 0)), $"n".cast(DecimalType(38, 0))))
        val wPrefix = org.apache.spark.sql.expressions.Window
          .partitionBy($"arm").orderBy($"dd")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val withPrefix = grid
          .withColumn("ps", sum($"sv").over(wPrefix))
          .withColumn("pn", sum($"n").over(wPrefix))
          .withColumn("qmean",
            when($"pn".isNull, lit(Long.MinValue))
              .otherwise(idiv(lit(1000000000000L).cast(DecimalType(38, 0)) *
                $"ps".cast(DecimalType(38, 0)), $"pn".cast(DecimalType(38, 0)))))
        // the day's leader: max (qmean, arm) across arms with history
        val wDay = org.apache.spark.sql.expressions.Window
          .partitionBy($"dd").orderBy($"qmean".desc, $"arm".desc)
        val leader = withPrefix
          .withColumn("rn", row_number().over(wDay)).filter($"rn" === 1)
          .select($"dd", $"arm".as("ftl_arm"), $"qmean")
          .filter($"qmean" =!= Long.MinValue) // day 1: no history, no play
        val played = leader.join(
          grid.select($"dd", $"arm".as("ftl_arm"), $"reward_e6"),
          Seq("dd", "ftl_arm"))
        // hindsight-best fixed arm: the arm with the max total e12 mean
        val best = grid.groupBy($"arm")
          .agg(sum($"sv").as("ts_"), sum($"n").as("tn"))
          .withColumn("q", idiv(lit(1000000000000L).cast(DecimalType(38, 0)) *
            $"ts_".cast(DecimalType(38, 0)), $"tn".cast(DecimalType(38, 0))))
          .orderBy($"q".desc, $"arm".desc).limit(1)
          .select($"arm".as("best_arm"))
        val bestRewards = best.crossJoin(grid)
          .filter($"arm" === $"best_arm")
          .select($"dd", $"reward_e6".as("best_reward_e6"))
        val wCum = org.apache.spark.sql.expressions.Window.orderBy($"dd")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        played.join(bestRewards, Seq("dd"))
          .withColumn("cum_ftl_e6", sum($"reward_e6").over(wCum))
          .withColumn("cum_best_e6", sum($"best_reward_e6").over(wCum))
          .select($"dd", $"ftl_arm", $"reward_e6", $"best_reward_e6",
            ($"cum_best_e6" - $"cum_ftl_e6").as("regret_e6"))
          .orderBy($"dd")
      },
      Some("""WITH grid AS (SELECT event_type AS arm, epoch_us(ts) // 86400000000 AS dd,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sv,
            count(*) AS n
          FROM events GROUP BY 1, 2),
        g AS (SELECT *, CAST((1000000 * CAST(sv AS HUGEINT)) // n AS BIGINT) AS reward_e6 FROM grid),
        pre AS (SELECT *,
            CAST(sum(sv) OVER (PARTITION BY arm ORDER BY dd
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS ps,
            CAST(sum(n) OVER (PARTITION BY arm ORDER BY dd
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS pn
          FROM g),
        q AS (SELECT *, CASE WHEN pn IS NULL THEN -9223372036854775808
            ELSE CAST((1000000000000 * CAST(ps AS HUGEINT)) // pn AS BIGINT)
            END AS qmean FROM pre),
        led AS (SELECT dd, arm AS ftl_arm, qmean,
            row_number() OVER (PARTITION BY dd ORDER BY qmean DESC, arm DESC) AS rn
          FROM q),
        play AS (SELECT l.dd, l.ftl_arm, g.reward_e6
          FROM led l JOIN g ON g.dd = l.dd AND g.arm = l.ftl_arm
          WHERE l.rn = 1 AND l.qmean <> -9223372036854775808),
        best AS (SELECT arm AS best_arm FROM
            (SELECT arm, (1000000000000 * CAST(sum(sv) AS HUGEINT))
                // CAST(sum(n) AS BIGINT) AS q
              FROM grid GROUP BY arm)
          ORDER BY q DESC, arm DESC LIMIT 1),
        br AS (SELECT g.dd, g.reward_e6 AS best_reward_e6
          FROM g JOIN best ON g.arm = best.best_arm)
        SELECT p.dd, p.ftl_arm, p.reward_e6, br.best_reward_e6,
          CAST(sum(br.best_reward_e6) OVER (ORDER BY p.dd) AS BIGINT)
            - CAST(sum(p.reward_e6) OVER (ORDER BY p.dd) AS BIGINT) AS regret_e6
        FROM play p JOIN br ON p.dd = br.dd
        ORDER BY p.dd"""),
      "Full-information follow-the-leader policy replay: per day the arm " +
        "with the best quantized prefix mean plays, realizing that day's " +
        "actual mean; cumulative regret vs the hindsight-best fixed arm — " +
        "prefix windows over the (day, arm) grid, one pass."),

    "theil_sen_slope" -> Q(
      (s, d) => {
        import s.implicits._
        // THEIL-SEN robust trend (median of pairwise slopes) per series —
        // the outlier-proof companion to grouped_regression's OLS: one
        // corrupted day moves OLS arbitrarily but shifts the slope MEDIAN
        // by one rank. Deterministic quantized form: each (i<j) day pair
        // contributes slope key trunc(10¹²·Δy/Δx) — Spark's IntegralDivide
        // and DuckDB's integer // BOTH truncate toward zero (verified:
        // -7//2 = -3 in DuckDB), so the quantized key is engine-identical
        // with no sign correction — and the series' slope is the
        // LOWER MEDIAN by (key, Δy, Δx) order (exact rational medians
        // cannot average two middle elements in integers; the lower-median
        // pick is the documented deterministic choice). Pair space is
        // O(days²) per series over the ~200-row daily aggregate, never
        // over raw events.
        val dayUs = 86400000000L
        val daily = eventsTable(s, d)
          .select($"event_type", idiv(micros($"ts"), lit(dayUs)).as("dd"),
            (dec2($"value") * 100).cast(LongType).as("vc"))
          .groupBy($"event_type", $"dd").agg(sum($"vc").as("y"))
        val pairs = daily.as("i").join(daily.as("j"),
            $"i.event_type" === $"j.event_type" && $"i.dd" < $"j.dd")
          .select($"i.event_type".as("event_type"),
            ($"j.y" - $"i.y").as("dy"), ($"j.dd" - $"i.dd").as("dx"))
          .withColumn("k", idiv(lit(1000000000000L).cast(DecimalType(38, 0)) *
            $"dy".cast(DecimalType(38, 0)), $"dx".cast(DecimalType(38, 0))))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"k", $"dy", $"dx")
        pairs
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy($"event_type")))
          .filter($"rn" === idiv($"cnt" + 1L, lit(2L)))
          .select($"event_type", $"cnt".as("n_pairs"), $"k".as("slope_e12"),
            $"dy".as("med_dy"), $"dx".as("med_dx"))
          .orderBy($"event_type")
      },
      Some("""WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS dd,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        pairs AS (SELECT i.event_type, j.y - i.y AS dy, j.dd - i.dd AS dx,
            CAST((1000000000000 * CAST(j.y - i.y AS HUGEINT))
              // (j.dd - i.dd) AS BIGINT) AS k
          FROM daily i JOIN daily j
            ON i.event_type = j.event_type AND i.dd < j.dd),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY k, dy, dx) AS rn,
            count(*) OVER (PARTITION BY event_type) AS cnt
          FROM pairs)
        SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs, k AS slope_e12,
          dy AS med_dy, dx AS med_dx
        FROM r WHERE rn = (cnt + 1) // 2 ORDER BY event_type"""),
      "Theil-Sen robust trend per series: lower-median of e12-quantized " +
        "pairwise daily slopes (truncating division, engine-identical) over " +
        "the O(days²) pair space of the daily aggregate."),

    "anova_oneway" -> Q(
      (s, d) => {
        import s.implicits._
        // One-way ANOVA across the event-type arms (does mean spend differ
        // between series?) — the k-group generalization of ab_welch_t.
        // Everything from two aggregates of integer sufficient statistics
        // (n_g, ΣX, ΣX² per group); the between/within sums of squares use
        // PER-GROUP FLOORED S_g²/n_g terms (≤ 1 unit of floor loss per
        // group, mirrored exactly by the oracle — determinism over the
        // last invisible decimal), and the F statistic is one e6
        // cross-multiplied division. DECIMAL(38,0)/HUGEINT products: S_g²
        // crosses BIGINT shortly past ~1e9 summed cents.
        val d38 = DecimalType(38, 0)
        val v = eventsTable(s, d).select($"event_type",
          (dec2($"value") * 100).cast(LongType).as("vc"))
        val g = v.groupBy($"event_type")
          .agg(count(lit(1)).as("n_g"), sum($"vc").as("s_g"),
            sum($"vc".cast(d38) * $"vc".cast(d38)).as("ss_g"))
        // internal sums stay DECIMAL(38,0) (a long Σ S_g²/n_g overflows at
        // extreme scale); the final BIGINT emissions fail loudly on
        // overflow — the covariance/moneyE guard discipline
        def toLongGuarded(c: org.apache.spark.sql.Column, name: String) =
          when(abs(c) > lit(Long.MaxValue), raise_error(concat(
            lit(s"anova_oneway: $name overflows BIGINT: "), c.cast("string"))))
            .otherwise(c).cast("long")
        // Per-group quotient guard: Spark's IntegralDivide narrows to BIGINT
        // no matter how wide the operands, so an S_g²/n_g term past
        // Long.MaxValue would become a silent non-ANSI NULL dropped from
        // sum(a) while DuckDB's HUGEINT // computes it exactly. Cap it
        // loudly BEFORE the division: the quotient fits BIGINT iff
        // S_g² ≤ Long.MaxValue · n_g (both sides exact in DECIMAL(38,0)).
        val sg2 = $"s_g".cast(d38) * $"s_g".cast(d38)
        val sg2Guarded = when(
          sg2 > lit(Long.MaxValue).cast(d38) * $"n_g".cast(d38),
          raise_error(concat(
            lit("anova_oneway: per-group S_g^2/n_g overflows BIGINT: "),
            sg2.cast("string")))).otherwise(sg2)
        val agg = g.agg(
          count(lit(1)).as("k"), sum($"n_g").as("n"),
          sum($"s_g").as("s"), sum($"ss_g").as("ss"),
          sum(idiv(sg2Guarded, $"n_g".cast(d38)).cast(d38)).as("a"))
        agg.select($"k", $"n",
            toLongGuarded($"a" - idiv($"s".cast(d38) * $"s".cast(d38),
              $"n".cast(d38)).cast(d38), "ssb").as("ssb_c2"),
            toLongGuarded($"ss" - $"a", "ssw").as("ssw_c2"))
          .select($"k", $"n", $"ssb_c2", $"ssw_c2",
            idiv(lit(1000000L).cast(d38) * $"ssb_c2".cast(d38) * ($"n" - $"k").cast(d38),
              greatest($"ssw_c2".cast(d38) * ($"k" - 1).cast(d38), lit(1L).cast(d38)))
              .cast("long").as("f_e6"))
      },
      Some("""WITH v AS (SELECT event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
          g AS (SELECT event_type, count(*) AS n_g, CAST(sum(vc) AS BIGINT) AS s_g,
              sum(CAST(vc AS HUGEINT) * vc) AS ss_g
            FROM v GROUP BY 1),
          t AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
              CAST(sum(s_g) AS BIGINT) AS s, sum(ss_g) AS ss,
              sum((CAST(s_g AS HUGEINT) * s_g) // n_g) AS a
            FROM g)
        SELECT k, n,
          CAST(a - (CAST(s AS HUGEINT) * s) // n AS BIGINT) AS ssb_c2,
          CAST(ss - a AS BIGINT) AS ssw_c2,
          CAST((1000000 * (a - (CAST(s AS HUGEINT) * s) // n) * (n - k))
            // greatest((ss - a) * (k - 1), 1) AS BIGINT) AS f_e6
        FROM t"""),
      "One-way ANOVA across the event-type arms: integer sufficient " +
        "statistics, per-group floored S²/n terms mirrored exactly, e6 " +
        "cross-multiplied F — two aggregates, no per-row second pass."),

    "survival_risk_table" -> Q(
      (s, d) => {
        import s.implicits._
        // Survival analysis (time from signup to first purchase, right-
        // censored at the corpus horizon): the Kaplan-Meier RISK TABLE —
        // per duration day t: users still at risk, observed events d,
        // censorings c. The risk table IS the exact-integer core of the
        // estimator (S(t) = Π(1 − dᵢ/nᵢ) is a float product over exactly
        // these columns), so it stays oracle-checkable where the product
        // would drift. Corpus-sized work: two per-user argmin aggregates +
        // one day-keyed count; the cumulative-at-risk window runs over the
        // AGGREGATED day table — O(distinct durations) ≤ O(days) rows at
        // any corpus scale, never the users.
        val day = 86400000000L
        val ev = eventsTable(s, d)
        val horizon = ev.agg(max(micros($"ts"))).head.getLong(0)
        val signup = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min(micros($"ts")).as("s0"))
        val firstBuy = ev.filter($"event_type" === "purchase")
          .select($"user_id", micros($"ts").as("pt"))
          .join(signup, "user_id").filter($"pt" >= $"s0")
          .groupBy($"user_id").agg(min($"pt").as("p0"))
        val durations = signup.join(firstBuy, Seq("user_id"), "left")
          .select($"user_id",
            when($"p0".isNotNull, idiv($"p0" - $"s0", lit(day)))
              .otherwise(idiv(lit(horizon) - $"s0", lit(day))).as("t"),
            when($"p0".isNotNull, 1L).otherwise(0L).as("event"))
        val byDay = durations.groupBy($"t")
          .agg(sum($"event").as("d"), sum(lit(1L) - $"event").as("c"))
        // at-risk = everyone whose duration is >= t ≡ the BACKWARD
        // cumulative of (d+c) — in-plan over the O(days) aggregate, no
        // second corpus-sized action just to learn the cohort size
        val w = org.apache.spark.sql.expressions.Window.orderBy($"t")
          .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
        byDay
          .withColumn("n_risk", sum($"d" + $"c").over(w))
          .select($"t", $"n_risk", $"d", $"c")
          .orderBy($"t")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
          hz AS (SELECT max(tsu) AS horizon FROM ev),
          su AS (SELECT user_id, min(tsu) AS s0 FROM ev
            WHERE event_type = 'signup' GROUP BY 1),
          fb AS (SELECT ev.user_id, min(tsu) AS p0 FROM ev JOIN su USING (user_id)
            WHERE event_type = 'purchase' AND tsu >= s0 GROUP BY 1),
          dur AS (SELECT su.user_id,
              CASE WHEN p0 IS NOT NULL THEN (p0 - s0) // 86400000000
                ELSE ((SELECT horizon FROM hz) - s0) // 86400000000 END AS t,
              CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM su LEFT JOIN fb ON su.user_id = fb.user_id),
          bd AS (SELECT t, CAST(sum(event) AS BIGINT) AS d,
              CAST(sum(1 - event) AS BIGINT) AS c FROM dur GROUP BY 1)
        SELECT t,
          CAST(sum(d + c) OVER
            (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
          d, c
        FROM bd ORDER BY t"""),
      "Kaplan-Meier risk table for signup -> first-purchase durations " +
        "(right-censored at the corpus horizon): per-day at-risk/event/" +
        "censor counts in exact integers — the estimator's core without " +
        "the float product; cumulative window over O(days) aggregate rows."),

    "dp_clipped_contributions" -> Q(
      (s, d) => {
        import s.implicits._
        // USER-LEVEL contribution bounding — the half of differential
        // privacy dp_noisy_counts doesn't show: before any noise is
        // calibrated, each user's total contribution to a released
        // aggregate must be CLIPPED to a fixed cap C (sensitivity = C per
        // user, however many events they have). Per (user, series): sum the
        // user's cents, clip at C; per series: released clipped sum, user
        // count, and how many users actually hit the cap (the
        // clipping-rate diagnostic that decides whether C is strangling
        // the signal). Two hash aggregates, exact integers.
        val C = 5000000L // 50k.00 in cents
        val perUser = eventsTable(s, d)
          .select($"event_type", $"user_id",
            (dec2($"value") * 100).cast(LongType).as("vc"))
          .groupBy($"event_type", $"user_id")
          .agg(sum($"vc").as("raw_c"))
          .select($"event_type", $"user_id", $"raw_c",
            least($"raw_c", lit(C)).as("clipped_c"))
        perUser.groupBy($"event_type")
          .agg(count(lit(1)).as("n_users"),
            sum($"raw_c").as("raw_sum_c"),
            sum($"clipped_c").as("clipped_sum_c"),
            sum(when($"raw_c" > C, 1L).otherwise(0L)).as("n_clipped"))
          .orderBy($"event_type")
      },
      Some("""WITH pu AS (SELECT event_type, user_id,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS raw_c
          FROM events GROUP BY 1, 2)
        SELECT event_type, count(*) AS n_users,
          CAST(sum(raw_c) AS BIGINT) AS raw_sum_c,
          CAST(sum(least(raw_c, 5000000)) AS BIGINT) AS clipped_sum_c,
          CAST(sum(CASE WHEN raw_c > 5000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM pu GROUP BY 1 ORDER BY 1"""),
      "User-level DP contribution bounding: per-user totals clipped at a " +
        "fixed cap before release (sensitivity = cap), with the " +
        "clipping-rate diagnostic — two exact-integer hash aggregates."),

    "target_encode_smoothed" -> Q(
      (s, d) => {
        import s.implicits._
        // Smoothed target encoding — the categorical-feature transform a
        // training pipeline fits on the label column: segment value →
        // (Σ_target + m·global_mean) / (n + m) with prior weight m=20.
        // Integer cents end-to-end: global mean floors once (gm = S div N,
        // broadcast one-row aggregate), then one floor per segment — both
        // engines replay the exact same two divisions. Sums ride
        // DECIMAL(38,0): a BIGINT Σprice_c saturates near 10 TB.
        val d38 = DecimalType(38, 0)
        val j = table(s, d, "orders")
          .join(table(s, d, "customer"), $"o_custkey" === $"c_custkey")
          .select($"c_mktsegment".as("segment"),
            (dec2($"o_totalprice") * 100).cast(LongType).cast(d38).as("pc"))
        val per = j.groupBy($"segment")
          .agg(count(lit(1)).as("n_orders"), sum($"pc").as("sum_c"))
        val glob = j.agg(sum($"pc").as("s_all"), count(lit(1)).as("n_all"))
          .select(idiv($"s_all", $"n_all".cast(d38)).as("gm_c"))
        per.crossJoin(broadcast(glob))
          .select($"segment", $"n_orders", $"gm_c",
            idiv($"sum_c" + lit(20L).cast(d38) * $"gm_c".cast(d38),
              ($"n_orders" + 20L).cast(d38)).as("enc_c"))
          .orderBy($"segment")
      },
      Some("""WITH j AS (SELECT c_mktsegment AS segment,
            CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS pc
          FROM orders JOIN customer ON o_custkey = c_custkey),
        g AS (SELECT CAST(sum(pc) // count(*) AS BIGINT) AS gm_c FROM j),
        p AS (SELECT segment, count(*) AS n_orders, sum(pc) AS sum_c FROM j GROUP BY 1)
        SELECT segment, n_orders, g.gm_c,
          CAST((p.sum_c + 20 * CAST(g.gm_c AS HUGEINT)) // (p.n_orders + 20) AS BIGINT) AS enc_c
        FROM p, g ORDER BY segment"""),
      "Smoothed target encoding of a categorical by the label mean: exact " +
        "integer-cents prior blend (n·mean + m·global_mean)/(n+m), one " +
        "aggregate plus a broadcast global-mean scalar."),

    "interarrival_stats" -> Q(
      (s, d) => {
        import s.implicits._
        // Per-user inter-event-gap statistics — the burstiness profile a
        // rate limiter or bot detector reads. One lag() over the shared
        // per-user sort, then integer sufficient statistics: mean gap =
        // Σg div n in µs, population variance = (n·Σg² − (Σg)²) div n²
        // emitted in SECONDS² (µs² overflows BIGINT output); Σg² rides
        // DECIMAL(38,0) (a 1-hour gap squares to 1.3e19 µs² — one gap
        // already breaks BIGINT).
        val d38 = DecimalType(38, 0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")
        eventsTable(s, d)
          .select($"user_id", micros($"ts").as("ts_us"), $"event_id")
          .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
          .filter($"gap_us".isNotNull)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_gaps"),
            sum($"gap_us").as("sum_g"),
            sum($"gap_us".cast(d38) * $"gap_us".cast(d38)).as("sum_g2"),
            max($"gap_us").as("max_gap_us"))
          .select($"user_id", $"n_gaps",
            idiv($"sum_g", $"n_gaps").as("mean_gap_us"),
            $"max_gap_us",
            idiv($"n_gaps".cast(d38) * $"sum_g2" - $"sum_g".cast(d38) * $"sum_g".cast(d38),
              $"n_gaps".cast(d38) * $"n_gaps".cast(d38) * lit(1000000000000L).cast(d38))
              .as("var_gap_s2"))
          .orderBy($"user_id")
      },
      Some("""WITH g AS (SELECT user_id,
            epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events),
        a AS (SELECT user_id, count(*) AS n_gaps,
            CAST(sum(gap_us) AS BIGINT) AS sum_g,
            sum(CAST(gap_us AS HUGEINT) * gap_us) AS sum_g2,
            max(gap_us) AS max_gap_us
          FROM g WHERE gap_us IS NOT NULL GROUP BY 1)
        SELECT user_id, n_gaps, sum_g // n_gaps AS mean_gap_us, max_gap_us,
          CAST((CAST(n_gaps AS HUGEINT) * sum_g2 - CAST(sum_g AS HUGEINT) * sum_g)
            // (CAST(n_gaps AS HUGEINT) * n_gaps * 1000000000000) AS BIGINT) AS var_gap_s2
        FROM a ORDER BY user_id"""),
      "Per-user inter-arrival statistics: one lag() on the shared per-user " +
        "sort, then integer sufficient statistics — mean/max gap in µs and " +
        "population variance in s² via DECIMAL(38,0)/HUGEINT products."),

    "near_duplicate_events" -> Q(
      (s, d) => {
        import s.implicits._
        // Duplicate-payment shape: pairs of events with the same (user,
        // whole-dollar amount) within 1 day. The scale path is time-bucket
        // blocking — bucket = ts div 1d; the probe side expands to its
        // 3 adjacent buckets, so the join is a pure EQUI-join on (user,
        // amount, bucket) and each qualifying pair matches in exactly one
        // probe (the left row's single bucket) — no dedup pass, no range
        // join, no cartesian. The oracle runs the quadratic self-join the
        // engine must never contain.
        val B = 86400000000L // 1 day in µs
        val base = eventsTable(s, d)
          .select($"user_id", $"event_id", micros($"ts").as("ts_us"),
            floor($"value").cast(LongType).as("value_c"))
          .withColumn("bucket", idiv($"ts_us", lit(B)))
        val probes = base
          .withColumn("probe", explode(array($"bucket" - 1, $"bucket", $"bucket" + 1)))
        base.as("a").join(probes.as("b"),
            $"a.user_id" === $"b.user_id" && $"a.value_c" === $"b.value_c" &&
              $"a.bucket" === $"b.probe" && $"a.event_id" < $"b.event_id")
          .filter(abs($"b.ts_us" - $"a.ts_us") <= B)
          .select($"a.user_id".as("user_id"), $"a.event_id".as("id_a"),
            $"b.event_id".as("id_b"), ($"b.ts_us" - $"a.ts_us").as("gap_us"),
            $"a.value_c".as("value_c"))
          .orderBy($"user_id", $"id_a", $"id_b")
      },
      Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
          epoch_us(b.ts) - epoch_us(a.ts) AS gap_us,
          CAST(floor(a.value) AS BIGINT) AS value_c
        FROM events a JOIN events b
          ON a.user_id = b.user_id
          AND CAST(floor(a.value) AS BIGINT) = CAST(floor(b.value) AS BIGINT)
          AND a.event_id < b.event_id
          AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 86400000000
        ORDER BY a.user_id, id_a, id_b"""),
      "Same-(user, amount-band) event pairs within 1 day via time-bucket " +
        "blocking: pure equi-join on (user, amount, bucket) with 3-bucket " +
        "probe expansion, each pair matched exactly once — the duplicate-" +
        "payment detector that never goes quadratic."),

    "cumulative_new_users" -> Q(
      (s, d) => {
        import s.implicits._
        // The growth curve: first-seen day per user (one aggregate over the
        // raw events), daily new-user counts, then the cumulative total.
        // The only window runs over the O(days) daily frame — bounded by
        // the calendar, not the corpus — the same shape changepoint_cusum
        // documents; everything corpus-sized is hash aggregates.
        val firstDay = eventsTable(s, d)
          .groupBy($"user_id")
          .agg(min(date_trunc("day", $"ts")).as("d0"))
        val daily = firstDay.groupBy($"d0").agg(count(lit(1)).as("new_users"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"d0")
          .rowsBetween(Long.MinValue, 0)
        daily
          .withColumn("cum_users", sum($"new_users").over(w))
          .select(micros($"d0").as("day_us"), $"new_users", $"cum_users")
          .orderBy($"day_us")
      },
      Some("""WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS d0
          FROM events GROUP BY 1),
        dd AS (SELECT d0, count(*) AS new_users FROM f GROUP BY 1)
        SELECT epoch_us(d0) AS day_us, new_users,
          CAST(sum(new_users) OVER (ORDER BY d0
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        FROM dd ORDER BY day_us"""),
      "New-user growth curve: first-seen day per user, daily counts, " +
        "cumulative sum over the O(days) bounded frame only."),

    "mann_whitney_u" -> Q(
      (s, d) => {
        import s.implicits._
        // Mann–Whitney U — the rank-based two-sample test beside
        // ab_welch_t, for when the value distribution is nowhere near
        // normal. Ranks are exact INTEGERS by doubling: with ties sharing
        // the average rank, 2·avgrank = 2·cum_before + cnt + 1 is always
        // integral. The rank table is O(distinct values) built by one
        // aggregate + PrefixSum's two-job scan — no rank() window over the
        // full corpus; rank sums ride DECIMAL(38,0) (Σ2r ≈ 2N² passes
        // BIGINT near 2e9 rows). 2U = 2R − n(n+1) per arm.
        val d38 = DecimalType(38, 0)
        val rows = eventsTable(s, d)
          .select(($"user_id" % 2).as("arm"),
            (dec2($"value") * 100).cast(LongType).as("vc"))
        val byVal = rows.groupBy($"vc")
          .agg(count(lit(1)).as("cnt"),
            sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n1v"))
          .withColumn("g", lit(0L))
        val cum = graft.operators.PrefixSum
          .groupedRunningTotal(byVal, Seq("g"), Seq(col("vc")), "cnt", "cumcnt")
          .withColumn("r2", lit(2L) * (col("cumcnt") - col("cnt")) + col("cnt") + 1L)
        val agg = cum.agg(
          sum($"n1v").as("n1"), sum($"cnt" - $"n1v").as("n0"),
          sum($"n1v".cast(d38) * $"r2".cast(d38)).as("r2s1"),
          sum(($"cnt" - $"n1v").cast(d38) * $"r2".cast(d38)).as("r2s0"))
        agg.select(lit(0L).as("arm"), $"n0".as("n"), $"r2s0".cast(LongType).as("r2_sum"),
            ($"r2s0" - $"n0".cast(d38) * ($"n0" + 1L).cast(d38)).cast(LongType).as("u2"))
          .unionByName(agg.select(lit(1L).as("arm"), $"n1".as("n"),
            $"r2s1".cast(LongType).as("r2_sum"),
            ($"r2s1" - $"n1".cast(d38) * ($"n1" + 1L).cast(d38)).cast(LongType).as("u2")))
          .orderBy($"arm")
      },
      Some("""WITH r AS (SELECT user_id % 2 AS arm,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        w AS (SELECT arm,
            2 * rank() OVER (ORDER BY vc) + count(*) OVER (PARTITION BY vc) - 1 AS r2
          FROM r),
        a AS (SELECT arm, count(*) AS n, sum(CAST(r2 AS HUGEINT)) AS r2_sum
          FROM w GROUP BY 1)
        SELECT CAST(arm AS BIGINT) AS arm, n, CAST(r2_sum AS BIGINT) AS r2_sum,
          CAST(r2_sum - CAST(n AS HUGEINT) * (n + 1) AS BIGINT) AS u2
        FROM a ORDER BY arm"""),
      "Mann-Whitney U (rank two-sample test): doubled tie-averaged ranks " +
        "stay integral, O(distinct) rank table via aggregate + PrefixSum — " +
        "no corpus-wide rank window — DECIMAL(38,0) rank sums, 2U per arm."),

    "ks_two_sample" -> Q(
      (s, d) => {
        import s.implicits._
        // Two-sample Kolmogorov–Smirnov D — the distribution-equality test
        // completing the suite (Welch mean, MWU location, χ² independence,
        // KS shape). D = max over values of |F1−F2|, computed as the exact
        // rational |cum1·n0 − cum0·n1| with ONE e6 floor at the end (the
        // max of the scaled numerators IS the max of the rationals — the
        // denominator n1·n0 is constant). Two PrefixSum scans over the
        // O(distinct values) frame (total cum and arm-1 cum; arm-0 falls
        // out by subtraction), argmax value tie-broken smallest via the
        // one-pass struct max.
        val d38 = DecimalType(38, 0)
        val rows = eventsTable(s, d)
          .select(($"user_id" % 2).as("arm"),
            (dec2($"value") * 100).cast(LongType).as("vc"))
        val byVal = rows.groupBy($"vc")
          .agg(count(lit(1)).as("cnt"),
            sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n1v"))
          .withColumn("g", lit(0L))
        val c1 = graft.operators.PrefixSum
          .groupedRunningTotal(byVal, Seq("g"), Seq(col("vc")), "cnt", "cumc")
        val c2 = graft.operators.PrefixSum
          .groupedRunningTotal(c1, Seq("g"), Seq(col("vc")), "n1v", "cum1")
        val tot = byVal.agg(sum($"n1v").as("n1"), sum($"cnt" - $"n1v").as("n0"))
        val diffs = c2.crossJoin(broadcast(tot))
          .withColumn("diff",
            abs($"cum1".cast(d38) * $"n0".cast(d38) -
              ($"cumc" - $"cum1").cast(d38) * $"n1".cast(d38)))
        diffs
          .agg(max(struct($"diff", (-$"vc").as("negv"))).as("w"),
            first($"n1").as("n1"), first($"n0").as("n0"))
          .select($"n1", $"n0",
            idiv(lit(1000000L).cast(d38) * $"w.diff",
              $"n1".cast(d38) * $"n0".cast(d38)).as("d_e6"),
            (-$"w.negv").as("at_value_c"))
      },
      Some("""WITH r AS (SELECT user_id % 2 AS arm,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        v AS (SELECT vc, count(*) AS cnt,
            sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1v
          FROM r GROUP BY 1),
        c AS (SELECT vc,
            CAST(sum(cnt) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumc,
            CAST(sum(n1v) OVER (ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1
          FROM v),
        t AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1, CAST(sum(cnt - n1v) AS BIGINT) AS n0 FROM v),
        dd AS (SELECT c.vc,
            abs(CAST(c.cum1 AS HUGEINT) * t.n0 - CAST(c.cumc - c.cum1 AS HUGEINT) * t.n1) AS diff
          FROM c, t),
        m AS (SELECT diff, vc FROM dd ORDER BY diff DESC, vc ASC LIMIT 1)
        SELECT t.n1, t.n0,
          CAST((1000000 * m.diff) // (CAST(t.n1 AS HUGEINT) * t.n0) AS BIGINT) AS d_e6,
          m.vc AS at_value_c
        FROM m, t"""),
      "Two-sample Kolmogorov-Smirnov: exact rational sup|F1-F2| via " +
        "cross-multiplied integer CDFs over the O(distinct) value frame " +
        "(two PrefixSum scans), one e6 floor, deterministic argmax."),

    "gini_concentration" -> Q(
      (s, d) => {
        import s.implicits._
        // Gini coefficient of order revenue per market segment — the
        // concentration statistic behind "top x% of orders carry y% of
        // revenue". Exact rational: G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx)
        // over each segment's ascending price ranks; ranks come from
        // PrefixSum's running count (range-exchange, no per-segment
        // window funnel — 5 segments would mean 5 tasks), products ride
        // DECIMAL(38,0), one e6 floor.
        val d38 = DecimalType(38, 0)
        val rows = table(s, d, "orders")
          .join(table(s, d, "customer"), $"o_custkey" === $"c_custkey")
          .select($"c_mktsegment".as("segment"),
            (dec2($"o_totalprice") * 100).cast(LongType).as("pc"),
            $"o_orderkey")
          .withColumn("one", lit(1L))
        val ranked = graft.operators.PrefixSum.groupedRunningTotal(
          rows, Seq("segment"), Seq(col("pc"), col("o_orderkey")), "one", "i")
        ranked.groupBy($"segment")
          .agg(count(lit(1)).as("n"), sum($"pc").as("sumx"),
            sum($"i".cast(d38) * $"pc".cast(d38)).as("sumix"))
          .select($"segment", $"n",
            idiv(lit(1000000L).cast(d38) *
                (lit(2L).cast(d38) * $"sumix" - ($"n" + 1L).cast(d38) * $"sumx".cast(d38)),
              $"n".cast(d38) * $"sumx".cast(d38)).as("gini_e6"))
          .orderBy($"segment")
      },
      Some("""WITH r AS (SELECT c_mktsegment AS segment,
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc, o_orderkey
          FROM orders JOIN customer ON o_custkey = c_custkey),
        w AS (SELECT segment, pc,
            row_number() OVER (PARTITION BY segment ORDER BY pc, o_orderkey) AS i
          FROM r),
        a AS (SELECT segment, count(*) AS n, CAST(sum(pc) AS HUGEINT) AS sumx,
            sum(CAST(i AS HUGEINT) * pc) AS sumix
          FROM w GROUP BY 1)
        SELECT segment, n,
          CAST((1000000 * (2 * sumix - (n + 1) * sumx)) // (CAST(n AS HUGEINT) * sumx) AS BIGINT) AS gini_e6
        FROM a ORDER BY segment"""),
      "Gini revenue concentration per segment: exact rational " +
        "(2 sum(i x) - (n+1) sum(x)) / (n sum(x)) with PrefixSum ranks " +
        "(no per-segment window funnel), DECIMAL(38,0) products, e6 floor."),

    "staleness_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Pipeline-health audit: per event stream (type), how far its
        // latest event lags the freshest event anywhere — the "this feed
        // died upstream" tripwire. One per-type max aggregate + a broadcast
        // global max; lag in µs with a 3-day staleness verdict.
        val perType = eventsTable(s, d)
          .groupBy($"event_type")
          .agg(max(micros($"ts")).as("last_ts_us"), count(lit(1)).as("n_events"))
        val global = perType.agg(max($"last_ts_us").as("global_ts_us"))
        perType.crossJoin(broadcast(global))
          .select($"event_type", $"n_events", $"last_ts_us",
            ($"global_ts_us" - $"last_ts_us").as("lag_us"),
            (($"global_ts_us" - $"last_ts_us") > 259200000000L).cast(LongType).as("is_stale"))
          .orderBy($"event_type")
      },
      Some("""WITH p AS (SELECT event_type, max(epoch_us(ts)) AS last_ts_us,
            count(*) AS n_events FROM events GROUP BY 1),
        g AS (SELECT max(last_ts_us) AS global_ts_us FROM p)
        SELECT event_type, n_events, last_ts_us,
          g.global_ts_us - last_ts_us AS lag_us,
          CAST(CASE WHEN g.global_ts_us - last_ts_us > 259200000000 THEN 1 ELSE 0 END AS BIGINT) AS is_stale
        FROM p, g ORDER BY event_type"""),
      "Per-stream staleness audit: latest event per type vs the global " +
        "freshest, lag in microseconds with a 3-day verdict — one aggregate " +
        "plus a broadcast scalar."),

    "reconciliation_audit" -> Q(
      (s, d) => {
        import s.implicits._
        // Cross-table financial reconciliation: the order header total vs
        // the sum of its line extensions ext·(1−disc)·(1+tax), folded to
        // per-status mismatch counts — the ledger-integrity audit every
        // ingest pipeline runs between fact tables. Exact rational cents:
        // ext_c·(100−disc_pct)·(100+tax_pct) per line (2-decimal fractions
        // → integral percents; DECIMAL(38,0) products), ONE floor by 10⁴
        // per order, abs diff against the header, $1 tolerance. One line
        // aggregate co-partitioned with the header join, O(statuses) fold.
        val d38 = DecimalType(38, 0)
        val li = table(s, d, "lineitem")
          .select($"l_orderkey",
            ((dec2($"l_extendedprice") * 100).cast(LongType).cast(d38) *
              (lit(100L) - (dec2($"l_discount") * 100).cast(LongType)).cast(d38) *
              (lit(100L) + (dec2($"l_tax") * 100).cast(LongType)).cast(d38)).as("ln"))
          .groupBy($"l_orderkey").agg(sum($"ln").as("lines_num"))
        val o = table(s, d, "orders")
          .select($"o_orderkey", $"o_orderstatus",
            (dec2($"o_totalprice") * 100).cast(LongType).as("total_c"))
        o.join(li, $"o_orderkey" === $"l_orderkey", "left")
          .select($"o_orderstatus",
            abs($"total_c" - coalesce(idiv($"lines_num", lit(10000L).cast(d38)), lit(0L)))
              .as("diff_c"))
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            sum(($"diff_c" > 100L).cast(LongType)).as("n_mismatched"),
            max($"diff_c").as("max_abs_diff_c"))
          .orderBy($"o_orderstatus")
      },
      Some("""WITH li AS (SELECT l_orderkey,
            sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
              * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
              * (100 + CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT))) AS lines_num
          FROM lineitem GROUP BY 1),
        j AS (SELECT o_orderstatus,
            abs(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              - coalesce(CAST(li.lines_num // 10000 AS BIGINT), 0)) AS diff_c
          FROM orders LEFT JOIN li ON o_orderkey = l_orderkey)
        SELECT o_orderstatus, count(*) AS n_orders,
          CAST(sum(CASE WHEN diff_c > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
          max(diff_c) AS max_abs_diff_c
        FROM j GROUP BY 1 ORDER BY o_orderstatus"""),
      "Ledger reconciliation (order header vs line-extension sums in exact " +
        "rational cents, one floor per order, $1 tolerance): per-status " +
        "mismatch counts — the fact-table integrity audit."),

    "cohort_ltv" -> Q(
      (s, d) => {
        import s.implicits._
        // The LTV TRIANGLE: users cohorted by first-event week, purchase
        // revenue accumulated by cohort age in weeks — the
        // retention_cohorts companion that tracks MONEY, not presence
        // (what a monetization dashboard actually plots). Two keyed
        // aggregations (per-user first event; per (cohort, age) revenue)
        // plus one cumulative window whose partitions are O(weeks) rows —
        // never a window over the raw event log. Revenue stays integer
        // cents end to end.
        val wk = 7L * 86400000000L
        val ev = eventsTable(s, d).select($"user_id", $"event_type",
          micros($"ts").as("us"), (dec2($"value") * 100).cast("long").as("vc"))
        val cohorts = ev.groupBy($"user_id")
          .agg(idiv(min($"us"), lit(wk)).as("cohort_week"))
        val sizes = cohorts.groupBy($"cohort_week")
          .agg(count(lit(1)).as("n_users"))
        val rev = ev.filter($"event_type" === "purchase")
          .join(cohorts, "user_id")
          .groupBy($"cohort_week",
            (idiv($"us", lit(wk)) - $"cohort_week").as("age_week"))
          .agg(sum($"vc").as("revenue_c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"cohort_week").orderBy($"age_week")
        rev.withColumn("cum_revenue_c", sum($"revenue_c").over(w))
          .join(sizes, "cohort_week")
          .select($"cohort_week", $"age_week", $"n_users",
            $"revenue_c", $"cum_revenue_c")
          .orderBy($"cohort_week", $"age_week")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        cohorts AS (SELECT user_id, min(us) // 604800000000 AS cohort_week
          FROM ev GROUP BY user_id),
        sizes AS (SELECT cohort_week, count(*) AS n_users FROM cohorts GROUP BY 1),
        rev AS (SELECT c.cohort_week, e.us // 604800000000 - c.cohort_week AS age_week,
            CAST(sum(e.vc) AS BIGINT) AS revenue_c
          FROM ev e JOIN cohorts c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' GROUP BY 1, 2)
        SELECT r.cohort_week, r.age_week, s.n_users, r.revenue_c,
          CAST(sum(r.revenue_c) OVER (PARTITION BY r.cohort_week ORDER BY r.age_week) AS BIGINT)
            AS cum_revenue_c
        FROM rev r JOIN sizes s ON r.cohort_week = s.cohort_week
        ORDER BY r.cohort_week, r.age_week"""),
      "LTV triangle: signup-week cohorts × age-week cumulative purchase " +
        "revenue in integer cents — the money companion to retention_cohorts."),

    "fellegi_sunter" -> Q(
      (s, d) => {
        import s.implicits._
        // Fellegi-Sunter probabilistic record linkage — the SCORING model
        // on top of the blocking step (phonetic_blocking_join finds
        // candidates; this decides): per candidate pair, an agreement
        // vector over (name, acctbal-cents, mktsegment), each field
        // contributing its log2(m/u) agreement weight or
        // log2((1−m)/(1−u)) disagreement weight — the (m, u) parameters
        // are CONFIGURED model constants, precomputed as e6 integer
        // literals identical on both engines (the nDCG libm-free
        // discipline). Candidates block on nation (the N² cross join
        // never materializes); the dirty side is a deterministic
        // key-driven corruption so both engines stage identical noise.
        // Output = the linkage confusion matrix: verdict (score
        // thresholds) × ground truth (same id), with score bounds.
        val (wNameA, wNameD) = (9891783L, -4320485L)   // m=.95,  u=.001
        val (wAcctA, wAcctD) = (10813781L, -3321207L)  // m=.9,   u=.0005
        val (wSegA, wSegD)   = (2292781L, -5321929L)   // m=.98,  u=.2
        val base = table(s, d, "customer").select($"c_custkey".as("id"),
          $"c_name", $"c_nationkey", $"c_mktsegment",
          round($"c_acctbal" * 100).cast("long").as("bal_c"))
        val dirty = base.select($"id".as("id_b"),
          when($"id" % 3 === 1,
            concat(substring($"c_name", 1, 2), substring($"c_name", 4, 1000)))
            .otherwise($"c_name").as("b_name"),
          $"c_nationkey".as("b_nat"),
          when($"id" % 7 === 1, lit("CORRUPTED")).otherwise($"c_mktsegment").as("b_seg"),
          when($"id" % 4 === 1, $"bal_c" + 1L).otherwise($"bal_c").as("b_bal_c"))
        val scored = base.join(dirty, $"c_nationkey" === $"b_nat")
          .withColumn("score_e6",
            when($"c_name" === $"b_name", wNameA).otherwise(wNameD)
              + when($"bal_c" === $"b_bal_c", wAcctA).otherwise(wAcctD)
              + when($"c_mktsegment" === $"b_seg", wSegA).otherwise(wSegD))
          .withColumn("verdict",
            when($"score_e6" >= 12000000L, "link")
              .when($"score_e6" <= -6000000L, "non_link")
              .otherwise("possible"))
          .withColumn("is_true_pair", $"id" === $"id_b")
        scored.groupBy($"verdict", $"is_true_pair")
          .agg(count(lit(1)).as("n_pairs"),
            min($"score_e6").as("min_score_e6"),
            max($"score_e6").as("max_score_e6"))
          .orderBy($"verdict", $"is_true_pair")
      },
      Some("""WITH base AS (SELECT c_custkey AS id, c_name, c_nationkey,
            c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer),
        dirty AS (SELECT id AS id_b,
            CASE WHEN id % 3 = 1
              THEN substr(c_name, 1, 2) || substr(c_name, 4) ELSE c_name END AS b_name,
            c_nationkey AS b_nat,
            CASE WHEN id % 7 = 1 THEN 'CORRUPTED' ELSE c_mktsegment END AS b_seg,
            CASE WHEN id % 4 = 1 THEN bal_c + 1 ELSE bal_c END AS b_bal_c
          FROM base),
        sc AS (SELECT id, id_b,
            CAST(CASE WHEN c_name = b_name THEN 9891783 ELSE -4320485 END
              + CASE WHEN bal_c = b_bal_c THEN 10813781 ELSE -3321207 END
              + CASE WHEN c_mktsegment = b_seg THEN 2292781 ELSE -5321929 END
              AS BIGINT) AS score_e6
          FROM base JOIN dirty ON c_nationkey = b_nat),
        v AS (SELECT *,
            CASE WHEN score_e6 >= 12000000 THEN 'link'
                 WHEN score_e6 <= -6000000 THEN 'non_link'
                 ELSE 'possible' END AS verdict,
            id = id_b AS is_true_pair
          FROM sc)
        SELECT verdict, is_true_pair, count(*) AS n_pairs,
          min(score_e6) AS min_score_e6, max(score_e6) AS max_score_e6
        FROM v GROUP BY 1, 2 ORDER BY verdict, is_true_pair"""),
      "Fellegi-Sunter record-linkage scoring over nation-blocked candidate " +
        "pairs: per-field log2(m/u) agreement weights as e6 integer " +
        "literals (libm-free), threshold verdicts, linkage confusion " +
        "matrix vs the deterministic ground truth."),

    "phonetic_blocking_join" -> Q(
      (s, d) => {
        import s.implicits._
        // Entity-resolution BLOCKING (the golden_record upstream): dirty
        // name variants resolve to canonical names by meeting ONLY inside
        // a phonetic-skeleton block (lowercase, strip vowels+spaces,
        // collapse repeat runs), then exact levenshtein verification and
        // deterministic min-(distance, name) pick. At 100 TB this is the
        // point: the skeleton equi-join replaces the N² name cross join
        // with hash-partitioned blocks, the same candidate-pruning stance
        // as the MinHash/SimHash banding — but for short strings where
        // shingling is meaningless. Dirty variants are synthesized
        // deterministically (drop 3rd char / double 2nd char by key mod),
        // so both engines stage identical corruption.
        val p = table(s, d, "part").select($"p_partkey".cast("long").as("id"), $"p_name")
        val dirty = p.select($"id",
          when($"id" % 5 === 1,
              concat(substring($"p_name", 1, 2), substring($"p_name", 4, 1000)))
            .when($"id" % 5 === 2,
              concat(substring($"p_name", 1, 2), substring($"p_name", 2, 1),
                substring($"p_name", 3, 1000)))
            .otherwise($"p_name").as("dirty_name"))
        val canon = p.groupBy($"p_name").agg(min($"id").as("canon_id"))
          .select($"p_name".as("canon_name"), $"canon_id")
        // repeat-run collapse via one per-consonant `cc+` regex, NOT a
        // backreference: DuckDB's RE2 engine has no backreferences (a
        // (.)\1+ pattern silently fails to collapse there), while `cc+`
        // collapses a run of any length identically in both engines.
        def skel(c: org.apache.spark.sql.Column) = {
          val stripped = regexp_replace(lower(c), "[aeiou ]", "")
          "bcdfghjklmnpqrstvwxyz".foldLeft(stripped) { (acc, ch) =>
            regexp_replace(acc, s"$ch$ch+", ch.toString)
          }
        }
        val joined = dirty.withColumn("k", skel($"dirty_name"))
          .join(canon.withColumn("k", skel($"canon_name")), "k")
          .withColumn("lev", levenshtein($"dirty_name", $"canon_name"))
          .filter($"lev" <= 2)
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"id")
          .orderBy($"lev", $"canon_name")
        joined.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"id", $"dirty_name", $"canon_name", $"lev".cast("long").as("lev"))
          .orderBy($"id")
      },
      Some("""WITH p AS (SELECT CAST(p_partkey AS BIGINT) AS id, p_name FROM part),
        dirty AS (SELECT id,
            CASE WHEN id % 5 = 1 THEN substr(p_name, 1, 2) || substr(p_name, 4)
                 WHEN id % 5 = 2 THEN substr(p_name, 1, 2) || substr(p_name, 2, 1) || substr(p_name, 3)
                 ELSE p_name END AS dirty_name
          FROM p),
        canon AS (SELECT p_name AS canon_name, min(id) AS canon_id FROM p GROUP BY 1),
        blocked AS (SELECT d.id, d.dirty_name, c.canon_name,
            levenshtein(d.dirty_name, c.canon_name) AS lev
          FROM dirty d JOIN canon c
            ON regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(d.dirty_name), '[aeiou ]', '', 'g'), 'bb+', 'b', 'g'), 'cc+', 'c', 'g'), 'dd+', 'd', 'g'), 'ff+', 'f', 'g'), 'gg+', 'g', 'g'), 'hh+', 'h', 'g'), 'jj+', 'j', 'g'), 'kk+', 'k', 'g'), 'll+', 'l', 'g'), 'mm+', 'm', 'g'), 'nn+', 'n', 'g'), 'pp+', 'p', 'g'), 'qq+', 'q', 'g'), 'rr+', 'r', 'g'), 'ss+', 's', 'g'), 'tt+', 't', 'g'), 'vv+', 'v', 'g'), 'ww+', 'w', 'g'), 'xx+', 'x', 'g'), 'yy+', 'y', 'g'), 'zz+', 'z', 'g')
             = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(c.canon_name), '[aeiou ]', '', 'g'), 'bb+', 'b', 'g'), 'cc+', 'c', 'g'), 'dd+', 'd', 'g'), 'ff+', 'f', 'g'), 'gg+', 'g', 'g'), 'hh+', 'h', 'g'), 'jj+', 'j', 'g'), 'kk+', 'k', 'g'), 'll+', 'l', 'g'), 'mm+', 'm', 'g'), 'nn+', 'n', 'g'), 'pp+', 'p', 'g'), 'qq+', 'q', 'g'), 'rr+', 'r', 'g'), 'ss+', 's', 'g'), 'tt+', 't', 'g'), 'vv+', 'v', 'g'), 'ww+', 'w', 'g'), 'xx+', 'x', 'g'), 'yy+', 'y', 'g'), 'zz+', 'z', 'g')
          WHERE levenshtein(d.dirty_name, c.canon_name) <= 2),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY id
            ORDER BY lev, canon_name) AS rn FROM blocked)
        SELECT id, dirty_name, canon_name, CAST(lev AS BIGINT) AS lev
        FROM ranked WHERE rn = 1 ORDER BY id"""),
      "Phonetic-skeleton blocking join (entity resolution): dirty names meet " +
        "canonical names only inside consonant-skeleton blocks, levenshtein " +
        "verification, deterministic min-(distance, name) resolution."),

    "bootstrap_ci_hash" -> Q(
      (s, d) => {
        import s.implicits._
        // DETERMINISTIC bootstrap confidence intervals for the per-type
        // mean spend: B = 200 resamples where row r's weight in resample b
        // is hash-derived (two glibc-LCG rounds over event_id·211 + b —
        // the ann_lsh poly discipline — mapped u%4 → {0,1,2,1}: mean 1,
        // var 1/2, an integer-exact multinomial-approximation resampling
        // scheme), so the whole interval is a pure function of the data.
        // Each resample mean is floored at e6; the CI bounds are the
        // order-statistic 2.5%/97.5% picks (ranks 5 and 196 of 200).
        // Scale: the B-fold blowup exists only BETWEEN the map-side
        // partial aggregate and the (type, b) reduce — the shuffle carries
        // B·|types| partial rows, never B·N; the final per-type window
        // ranks 200 rows.
        val B = 200
        val ev = eventsTable(s, d).select($"event_type", $"event_id",
          (dec2($"value") * 100).cast("long").as("vc"))
        val withB = ev.select($"event_type", $"event_id", $"vc",
          explode(sequence(lit(0), lit(B - 1))).as("b"))
        // pre-reduced mod 2^31 before each multiply: no intermediate tops
        // 1103515245·2^31 < 2^62, so the weights never silently wrap at
        // large event_id (and u2 stays non-negative, keeping the
        // element_at index in [1,4]); same values where no overflow.
        val x = (($"event_id" % 2147483648L) * 211L + $"b") % 2147483648L
        val u1 = (lit(1103515245L) * x + 12345L) % 2147483648L
        val u2 = (lit(1103515245L) * u1 + 12345L) % 2147483648L
        val wgt = element_at(typedLit(Seq(0L, 1L, 2L, 1L)), (u2 % 4).cast("int") + 1)
        val perB = withB.withColumn("w", wgt)
          .groupBy($"event_type", $"b")
          .agg(sum($"w" * $"vc").as("swv"), sum($"w").as("sw"))
          .withColumn("mean_e6", idiv(lit(1000000L).cast(DecimalType(38, 0)) *
            $"swv".cast(DecimalType(38, 0)),
            greatest($"sw", lit(1L)).cast(DecimalType(38, 0))).cast("long"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"mean_e6", $"b")
        perB.withColumn("rk", row_number().over(wRank))
          .groupBy($"event_type")
          .agg(max(when($"rk" === 5, $"mean_e6")).as("mean_lo_e6"),
            max(when($"rk" === 196, $"mean_e6")).as("mean_hi_e6"))
          .orderBy($"event_type")
      },
      Some("""WITH ev AS (SELECT event_type, event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
        wb AS (SELECT event_type, event_id, vc, b.b,
            ((1103515245*((1103515245*(((event_id % 2147483648)*211 + b.b) % 2147483648) + 12345) % 2147483648)
              + 12345) % 2147483648) % 4 AS u
          FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 199)) AS b) b),
        w AS (SELECT event_type, b, vc,
            (CASE u WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 1 END) AS w
          FROM wb),
        perb AS (SELECT event_type, b,
            CAST(sum(w * vc) AS BIGINT) AS swv, CAST(sum(w) AS BIGINT) AS sw
          FROM w GROUP BY 1, 2),
        m AS (SELECT event_type, b,
            CAST((1000000 * CAST(swv AS HUGEINT)) // greatest(sw, 1) AS BIGINT) AS mean_e6 FROM perb),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY mean_e6, b) AS rk FROM m)
        SELECT event_type,
          CAST(max(CASE WHEN rk = 5 THEN mean_e6 END) AS BIGINT) AS mean_lo_e6,
          CAST(max(CASE WHEN rk = 196 THEN mean_e6 END) AS BIGINT) AS mean_hi_e6
        FROM r GROUP BY event_type ORDER BY event_type"""),
      "Deterministic hash-weighted bootstrap (B=200, LCG {0,1,2,1} weights): " +
        "order-statistic 95% CI of per-type mean spend, integer-exact end to " +
        "end — map-side partials keep the shuffle at B x |types| rows.")
  ,

    "spearman_corr" -> Q(
      (s, d) => {
        import s.implicits._
        // Spearman rank correlation (quantity vs discount per return flag)
        // — the MONOTONE-association companion to corr_matrix's Pearson:
        // rank-transform both measures, then Pearson on the ranks. Ties
        // take midranks, kept INTEGRAL as 2·midrank = 2·rank() + ties − 1
        // (rank() is the min rank, so the doubling clears the half) —
        // every downstream sufficient statistic stays integer. Emission is
        // the assortativity discipline: sign + ρ²·10⁶ sqrt-free, with the
        // DIV-n reduction on covariance/variances first so the squares
        // stay inside DECIMAL(38,0) at any corpus size. Cost: two window
        // sorts sharing one (flag) partition + one sufficient-stats fold.
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val li = table(s, d, "lineitem").select($"l_returnflag",
          round($"l_quantity").cast("long").as("q"),
          round($"l_discount" * 100).cast("long").as("dd"))
        def rank2(c: String): org.apache.spark.sql.Column = {
          val wOrd = org.apache.spark.sql.expressions.Window
            .partitionBy($"l_returnflag").orderBy(col(c))
          val wVal = org.apache.spark.sql.expressions.Window
            .partitionBy($"l_returnflag", col(c))
          rank().over(wOrd).cast("long") * 2 + count(lit(1)).over(wVal) - 1
        }
        val ranked = li.withColumn("rx", rank2("q")).withColumn("ry", rank2("dd"))
        val sums = ranked.groupBy($"l_returnflag").agg(
          count(lit(1)).as("n"),
          sum($"rx").as("sx"), sum($"ry").as("sy"),
          sum($"rx".cast(d38) * $"rx".cast(d38)).as("sxx"),
          sum($"ry".cast(d38) * $"ry".cast(d38)).as("syy"),
          sum($"rx".cast(d38) * $"ry".cast(d38)).as("sxy"))
        val covN = $"n".cast(d38) * $"sxy" - $"sx".cast(d38) * $"sy".cast(d38)
        val varXN = $"n".cast(d38) * $"sxx" - $"sx".cast(d38) * $"sx".cast(d38)
        val varYN = $"n".cast(d38) * $"syy" - $"sy".cast(d38) * $"sy".cast(d38)
        sums
          .withColumn("cov_e", when(covN >= 0, idiv(covN, $"n".cast(d38)))
            .otherwise(-idiv(-covN, $"n".cast(d38))))
          .withColumn("varx_e", idiv(varXN, $"n".cast(d38)))
          .withColumn("vary_e", idiv(varYN, $"n".cast(d38)))
          .select($"l_returnflag", $"n",
            signum($"cov_e").cast("long").as("rho_sign"),
            // constant-rank guard: a group whose quantity or discount ranks
            // are all equal has varx_e·vary_e = 0, where Spark's decimal
            // IntegralDivide yields NULL but DuckDB's // raises — pin ρ² = 0
            // on both engines (cuped_adjusted_ab's den=0 discipline)
            when($"varx_e".cast(d38) * $"vary_e".cast(d38) === 0, lit(0L))
              .otherwise(idiv(
                lit(1000000L).cast(d38) * $"cov_e".cast(d38) * $"cov_e".cast(d38),
                $"varx_e".cast(d38) * $"vary_e".cast(d38)).cast("long"))
              .as("rho2_e6"))
          .orderBy($"l_returnflag")
      },
      Some("""WITH li AS (SELECT l_returnflag,
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST(round(l_discount * 100) AS BIGINT) AS dd FROM lineitem),
        rk AS (SELECT l_returnflag,
            rank() OVER (PARTITION BY l_returnflag ORDER BY q) * 2
              + count(*) OVER (PARTITION BY l_returnflag, q) - 1 AS rx,
            rank() OVER (PARTITION BY l_returnflag ORDER BY dd) * 2
              + count(*) OVER (PARTITION BY l_returnflag, dd) - 1 AS ry
          FROM li),
        s AS (SELECT l_returnflag, count(*) AS n,
            CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
            sum(CAST(rx AS HUGEINT) * rx) AS sxx,
            sum(CAST(ry AS HUGEINT) * ry) AS syy,
            sum(CAST(rx AS HUGEINT) * ry) AS sxy
          FROM rk GROUP BY 1),
        f AS (SELECT l_returnflag, n,
            CASE WHEN n * sxy - sx * sy >= 0
              THEN (n * sxy - sx * sy) // n
              ELSE -((-(n * sxy - sx * sy)) // n) END AS cov_e,
            (n * sxx - sx * sx) // n AS varx_e,
            (n * syy - sy * sy) // n AS vary_e
          FROM s)
        SELECT l_returnflag, n,
          CAST(CASE WHEN cov_e > 0 THEN 1 WHEN cov_e < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS rho_sign,
          CAST(CASE WHEN varx_e * vary_e = 0 THEN 0
            ELSE (1000000 * cov_e * cov_e) // (varx_e * vary_e) END
            AS BIGINT) AS rho2_e6
        FROM f ORDER BY l_returnflag"""),
      "Spearman rank correlation (sign + rho2 in e6, sqrt-free): integral " +
        "2-midranks with tie handling, Pearson sufficient stats on the " +
        "ranks, DIV-n reduction keeping every square inside DECIMAL(38,0)."),

    "kaplan_meier_curve" -> Q(
      (s, d) => {
        import s.implicits._
        // The Kaplan-Meier PRODUCT-LIMIT curve — the estimator
        // survival_risk_table deliberately stopped short of (its doc: the
        // Π(1−dᵢ/nᵢ) float product would drift). Here the product is
        // SCALED-INTEGER SEQUENTIAL: s_i = ⌊s_{i−1}·(n_i−d_i)/n_i⌋ from
        // s_0 = 10¹², each step exact (JVM BigInt intermediate, so
        // s·(n−d) cannot wrap at any cohort size) and bit-replayable by the
        // oracle's recursive CTE. The fold is inherently sequential, but it
        // runs on ONE partition of the AGGREGATED day table — O(distinct
        // duration days), calendar-bounded at any corpus scale — while the
        // corpus-sized work (two per-user argmin aggregates + the day-keyed
        // count) stays fully distributed, exactly like survival_risk_table.
        val day = 86400000000L
        val ev = eventsTable(s, d)
        val horizon = ev.agg(max(micros($"ts"))).head.getLong(0)
        val signup = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min(micros($"ts")).as("s0"))
        val firstBuy = ev.filter($"event_type" === "purchase")
          .select($"user_id", micros($"ts").as("pt"))
          .join(signup, "user_id").filter($"pt" >= $"s0")
          .groupBy($"user_id").agg(min($"pt").as("p0"))
        val durations = signup.join(firstBuy, Seq("user_id"), "left")
          .select(
            when($"p0".isNotNull, idiv($"p0" - $"s0", lit(day)))
              .otherwise(idiv(lit(horizon) - $"s0", lit(day))).as("t"),
            when($"p0".isNotNull, 1L).otherwise(0L).as("event"))
        val byDay = durations.groupBy($"t")
          .agg(sum($"event").as("d"), sum(lit(1L) - $"event").as("c"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"t")
          .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
        graft.operators.KaplanMeier.productLimit(
            byDay.withColumn("n_risk", sum($"d" + $"c").over(w)))
          .orderBy($"t")
      },
      Some("""WITH RECURSIVE ev AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
          hz AS (SELECT max(tsu) AS horizon FROM ev),
          su AS (SELECT user_id, min(tsu) AS s0 FROM ev
            WHERE event_type = 'signup' GROUP BY 1),
          fb AS (SELECT ev.user_id, min(tsu) AS p0 FROM ev JOIN su USING (user_id)
            WHERE event_type = 'purchase' AND tsu >= s0 GROUP BY 1),
          dur AS (SELECT
              CASE WHEN p0 IS NOT NULL THEN (p0 - s0) // 86400000000
                ELSE ((SELECT horizon FROM hz) - s0) // 86400000000 END AS t,
              CASE WHEN p0 IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM su LEFT JOIN fb ON su.user_id = fb.user_id),
          bd AS (SELECT t, CAST(sum(event) AS BIGINT) AS d,
              CAST(sum(1 - event) AS BIGINT) AS c FROM dur GROUP BY 1),
          br AS (SELECT t, d,
              CAST(sum(d + c) OVER
                (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
              row_number() OVER (ORDER BY t) AS rn
            FROM bd),
          km AS (
            SELECT rn, t, n_risk, d,
              CAST((CAST(1000000000000 AS HUGEINT) * (n_risk - d)) // n_risk AS BIGINT) AS s
            FROM br WHERE rn = 1
            UNION ALL
            SELECT br.rn, br.t, br.n_risk, br.d,
              CAST((CAST(km.s AS HUGEINT) * (br.n_risk - br.d)) // br.n_risk AS BIGINT)
            FROM km JOIN br ON br.rn = km.rn + 1)
        SELECT t, n_risk, d, s AS surv_e12 FROM km ORDER BY t"""),
      "Kaplan-Meier product-limit survival curve in scaled-integer " +
        "sequential arithmetic (s_i = floor(s_{i-1}(n_i-d_i)/n_i), e12): " +
        "the fold is O(distinct days) on one partition AFTER the " +
        "distributed per-user aggregates; oracle = recursive-CTE replay."),

    "markov_attribution_removal" -> Q(
      (s, d) => {
        import s.implicits._
        // Markov REMOVAL-EFFECT attribution — the data-driven multi-touch
        // model beside last-touch and position-based: per-user journeys
        // (touches until the first purchase, CONV/NULL absorbing) define a
        // first-order chain; a channel's credit is how much conversion
        // disappears when the channel is removed (its outgoing edges
        // dropped, edges INTO it redirected to NULL). Conversion = K=4
        // backward absorption value iterations in the scaled-integer
        // discipline (exact BigInt numerator sums, one floor per state and
        // iteration — bit-replayable as unrolled SQL). The corpus-sized
        // work is ONE distributed transition-count scan; the O(channels²)
        // count table is then solved on the driver for all 5 chain
        // variants (operators.MarkovAbsorb — re-running 5×4 join
        // iterations in-plan would replay the corpus scan ~40×). Channel
        // set is a QUERY PARAMETER (literal on both engines), not
        // data-derived, so the unrolled oracle is well-defined at any SF.
        val channels = Seq("click", "error", "signup", "view")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"tsu", $"event_id")
        val ev = eventsTable(s, d)
          .filter($"event_type".isin(channels :+ "purchase": _*))
          .select($"user_id", $"event_id", micros($"ts").as("tsu"), $"event_type")
          .withColumn("cum_p",
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(w))
        val journey = ev
          .filter($"cum_p" === 0L || ($"event_type" === "purchase" && $"cum_p" === 1L))
          .withColumn("state",
            when($"event_type" === "purchase", lit("CONV")).otherwise($"event_type"))
        val steps = journey
          .withColumn("prev", coalesce(lag($"state", 1).over(w), lit("START")))
          .select($"prev".as("i"), $"state".as("j"))
        val tails = journey.groupBy($"user_id")
          .agg(max_by($"state", struct($"tsu", $"event_id")).as("i"))
          .filter($"i" =!= "CONV")
          .select($"i", lit("NULL").as("j"))
        val c = steps.unionByName(tails)
          .groupBy($"i", $"j").agg(count(lit(1)).as("cij"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val res = graft.operators.MarkovAbsorb
          .removalEffects(c, channels, iters = 4, scale = 1000000L)
        val tot = res.map { case (_, re) => math.max(re, 0L) }.sum
        val out = res.map { case (x, re) =>
          val credit =
            if (tot == 0L) 0L
            else (BigInt(math.max(re, 0L)) * 1000000L / tot).toLong
          (x, re, credit)
        }
        out.toDF("channel", "removal_effect_e6", "credit_e6")
          .orderBy($"channel")
      },
      Some(markovRemovalSql),
      "Markov removal-effect multi-touch attribution: journey chain from " +
        "one distributed transition-count scan, K=4 scaled-integer " +
        "absorption iterations per chain variant solved at O(channels²) " +
        "driver scale; oracle = fully unrolled 5-variant SQL replay."),

    "cuped_adjusted_ab" -> Q(
      (s, d) => {
        import s.implicits._
        // CUPED variance-reduced A/B readout (Deng et al. 2013, public):
        // per-user pre-exposure covariate X (view-value cents) adjusts the
        // outcome Y (purchase-value cents); θ = cov(X,Y)/var(X) from pooled
        // integer sufficient statistics, arms split by the deterministic
        // user_id parity rule. Everything stays an exact integer until ONE
        // truncating division per output column: θ and the raw/adjusted
        // treatment-control deltas come out as e6-scaled integers over a
        // common exact denominator —
        //   Δadj = [den·(Σyₜ·n_c − Σy_c·nₜ) − num·(Σxₜ·n_c − Σx_c·nₜ)]
        //          / (den·nₜ·n_c)
        // — so the result is bit-equal across engines where a float CUPED
        // would drift with summation order. Magnitude: every product runs
        // in DECIMAL(38,0)/HUGEINT; den·Σy·n stays inside 10³⁸ to ~10⁶
        // users at these cent scales (past that, pre-scale cents→dollars —
        // the corr_matrix widening note). One corpus scan, one hash
        // aggregate per user, one global aggregate: no window, no shuffle
        // beyond the user-keyed combine.
        val d38 = DecimalType(38, 0)
        val pu = eventsTable(s, d)
          .select($"user_id",
            when($"event_type" === "view", (dec2($"value") * 100).cast(LongType))
              .otherwise(0L).as("xc"),
            when($"event_type" === "purchase", (dec2($"value") * 100).cast(LongType))
              .otherwise(0L).as("yc"))
          .groupBy($"user_id")
          .agg(sum($"xc").as("x"), sum($"yc").as("y"))
          .withColumn("tr", pmod($"user_id", lit(2L)))
        val st = pu.agg(
          count(lit(1)).cast(d38).as("n"),
          sum($"x").cast(d38).as("sx"), sum($"y").cast(d38).as("sy"),
          sum($"x".cast(d38) * $"x".cast(d38)).as("sxx"),
          sum($"x".cast(d38) * $"y".cast(d38)).as("sxy"),
          sum(when($"tr" === 1L, 1L).otherwise(0L)).cast(d38).as("nt"),
          sum(when($"tr" === 1L, $"x").otherwise(0L)).cast(d38).as("sxt"),
          sum(when($"tr" === 1L, $"y").otherwise(0L)).cast(d38).as("syt"))
        val num = $"n" * $"sxy" - $"sx" * $"sy"
        val den = $"n" * $"sxx" - $"sx" * $"sx"
        val nc = $"n" - $"nt"
        val sxc = $"sx" - $"sxt"
        val syc = $"sy" - $"syt"
        val dyN = $"syt" * nc - syc * $"nt"
        val dxN = $"sxt" * nc - sxc * $"nt"
        val e6 = lit(1000000L).cast(d38)
        // Spark narrows an overflowing DECIMAL(38,0) product to NULL where
        // DuckDB's HUGEINT raises — detect the narrow and raise loudly so
        // both engines fail the same way (the anova guard discipline);
        // inputs are never null, so a null product IS the overflow.
        val adjNum = e6 * (den * dyN - num * dxN)
        val adjDen = den * $"nt" * nc
        val adjGuarded = when(adjNum.isNull || adjDen.isNull, raise_error(lit(
            "cuped_adjusted_ab: DECIMAL(38,0) overflow in the adjusted " +
              "delta - pre-scale cents (see scaladoc)")))
          .otherwise(idiv(adjNum, adjDen).cast(LongType))
        st.select(
          $"n".cast(LongType).as("n_users"),
          $"nt".cast(LongType).as("n_treat"),
          when(den === 0, 0L)
            .otherwise(idiv(e6 * num, den).cast(LongType)).as("theta_e6"),
          idiv(e6 * dyN, $"nt" * nc).cast(LongType).as("delta_raw_e6"),
          when(den === 0, idiv(e6 * dyN, $"nt" * nc).cast(LongType))
            .otherwise(adjGuarded).as("delta_adj_e6"))
      },
      Some("""WITH pu AS (SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'view'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
            CAST(sum(CASE WHEN event_type = 'purchase'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS HUGEINT) AS y
          FROM events GROUP BY 1),
        st AS (SELECT CAST(count(*) AS HUGEINT) AS n,
            sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
            sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END) AS sxt,
            sum(CASE WHEN user_id % 2 = 1 THEN y ELSE 0 END) AS syt
          FROM pu),
        f AS (SELECT n, nt,
            n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
            syt * (n - nt) - (sy - syt) * nt AS dyn,
            sxt * (n - nt) - (sx - sxt) * nt AS dxn
          FROM st)
        SELECT CAST(n AS BIGINT) AS n_users, CAST(nt AS BIGINT) AS n_treat,
          CAST(CASE WHEN den = 0 THEN 0
            WHEN 1000000 * num >= 0 THEN (1000000 * num) // den
            ELSE -((-(1000000 * num)) // den) END AS BIGINT) AS theta_e6,
          CAST(CASE WHEN 1000000 * dyn >= 0 THEN (1000000 * dyn) // (nt * (n - nt))
            ELSE -((-(1000000 * dyn)) // (nt * (n - nt))) END AS BIGINT) AS delta_raw_e6,
          CAST(CASE
            WHEN den = 0 THEN
              CASE WHEN 1000000 * dyn >= 0 THEN (1000000 * dyn) // (nt * (n - nt))
                ELSE -((-(1000000 * dyn)) // (nt * (n - nt))) END
            WHEN 1000000 * (den * dyn - num * dxn) >= 0
              THEN (1000000 * (den * dyn - num * dxn)) // (den * nt * (n - nt))
            ELSE -((-(1000000 * (den * dyn - num * dxn))) // (den * nt * (n - nt)))
          END AS BIGINT) AS delta_adj_e6
        FROM f"""),
      "CUPED variance-reduced A/B delta from pooled integer sufficient " +
        "statistics (theta = cov/var as an exact rational, one truncating " +
        "e6 division per output) — bit-equal where float CUPED drifts."),

    "holt_linear_smoothing" -> Q(
      (s, d) => {
        import s.implicits._
        // Holt linear (double-exponential) smoothing of the per-type daily
        // revenue series — the trend-aware companion to the truncated EWMA
        // (decayed_rolling_sum) and the CUSUM changepoint: level and trend
        // fold sequentially with α=1/5, β=1/10 as EXACT integer recurrences
        // (one TRUNCATING division per component per step — matching the
        // measured DuckDB `//` semantic on negative trends). No closed form
        // exists once per-step flooring is in play, so the fold runs as the
        // secondary-sort keyed pass in operators.HoltLinear: repartition by
        // series, sortWithinPartitions, O(1) state — never a buffered
        // group; the input is the day-AGGREGATED table (O(series × days),
        // calendar-bounded), the corpus-sized work is the one upstream
        // aggregate. Oracle = per-series recursive-CTE bit replay.
        val byDay = eventsTable(s, d)
          .groupBy($"event_type".as("k"),
            micros(date_trunc("day", $"ts")).as("t"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
        graft.operators.HoltLinear.smooth(byDay)
          .select($"k".as("event_type"), $"t".as("day_us"), $"v".as("v_c"),
            $"level".as("level_c"), $"trend".as("trend_c"),
            $"forecast1".as("forecast1_c"))
          .orderBy($"event_type", $"day_us")
      },
      Some(holtOracleSql),
      "Holt linear smoothing (level+trend, alpha=1/5 beta=1/10) as a keyed " +
        "secondary-sort integer fold with one truncating division per " +
        "component per step — O(1) state per series, bit-replayed by a " +
        "recursive CTE."),

    "holt_winters_additive" -> Q(
      (s, d) => {
        import s.implicits._
        // Holt-Winters ADDITIVE smoothing (level + trend + period-7
        // seasonal) — the seasonal capstone of the forecast family
        // (holt_linear_smoothing is level+trend; the daily series here
        // really do carry a weekly cycle, see dow_seasonality). α=1/5,
        // β=1/10, γ=1/4 as EXACT integer recurrences with one truncating
        // division per component per step; missing seasonal history reads
        // 0 (the deterministic initialization both engines replay). The
        // fold is operators.HoltWinters' secondary-sort pass — O(period)
        // state per series, day-aggregated input. The oracle's recursive
        // CTE carries the 7-slot seasonal RING as a list column, sliding
        // one slot per row — a bit replay including the ring mechanics.
        val byDay = eventsTable(s, d)
          .groupBy($"event_type".as("k"),
            micros(date_trunc("day", $"ts")).as("t"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
        graft.operators.HoltWinters.smooth(byDay, period = 7)
          .select($"k".as("event_type"), $"t".as("day_us"), $"v".as("v_c"),
            $"level".as("level_c"), $"trend".as("trend_c"),
            $"seasonal".as("seasonal_c"), $"forecast1".as("forecast1_c"))
          .orderBy($"event_type", $"day_us")
      },
      Some(holtWintersOracleSql),
      "Holt-Winters additive smoothing (weekly seasonal, alpha=1/5 " +
        "beta=1/10 gamma=1/4): integer recurrences with an O(period) " +
        "seasonal ring per series, bit-replayed by a recursive CTE that " +
        "slides the ring as a list column."),

    "mann_kendall_trend" -> Q(
      (s, d) => {
        import s.implicits._
        // Mann-Kendall trend test per event-type daily series — the
        // NON-PARAMETRIC companion to theil_sen_slope (which estimates the
        // slope this test decides the significance of): S = Σ_{i<j}
        // sign(v_j − v_i) over day pairs, with the tie-corrected variance
        // numerator 18·Var(S) = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) kept
        // as an EXACT integer (no /18, no sqrt — the caller owns the final
        // z if wanted). The pair self-join runs on the day-AGGREGATED
        // table: O(days²) per series is calendar-bounded (~250k pairs per
        // series at ANY corpus scale); the corpus-sized work is the one
        // daily aggregate.
        val bd = eventsTable(s, d)
          .groupBy($"event_type".as("k"),
            micros(date_trunc("day", $"ts")).as("t"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
        val sStat = bd.as("a").join(bd.as("b"),
            $"a.k" === $"b.k" && $"a.t" < $"b.t")
          .groupBy($"a.k".as("k"))
          .agg(sum(when($"b.v" > $"a.v", 1L)
            .when($"b.v" < $"a.v", -1L).otherwise(0L)).as("s_stat"))
        val nDays = bd.groupBy($"k").agg(count(lit(1)).as("n_days"))
        val ties = bd.groupBy($"k", $"v").agg(count(lit(1)).as("c"))
          .groupBy($"k")
          .agg(sum($"c" * ($"c" - 1) * (lit(2L) * $"c" + 5)).as("tie_term"))
        nDays.join(sStat, "k").join(ties, "k")
          .select($"k".as("event_type"), $"n_days", $"s_stat",
            ($"n_days" * ($"n_days" - 1) * (lit(2L) * $"n_days" + 5)
              - $"tie_term").as("var18"))
          .orderBy($"event_type")
      },
      Some("""WITH bd AS (SELECT event_type AS k,
            epoch_us(date_trunc('day', ts)) AS t,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        s AS (SELECT a.k,
            CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
          FROM bd a JOIN bd b ON a.k = b.k AND a.t < b.t GROUP BY 1),
        n AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days FROM bd GROUP BY 1),
        tg AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM bd GROUP BY k, v),
        ti AS (SELECT k, CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_term
          FROM tg GROUP BY 1)
        SELECT n.k AS event_type, n_days, s_stat,
          CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT) AS var18
        FROM n JOIN s ON n.k = s.k JOIN ti ON n.k = ti.k
        ORDER BY event_type"""),
      "Mann-Kendall trend test per daily series: exact-integer S and " +
        "tie-corrected 18*Var(S); the pair join is calendar-bounded " +
        "O(days^2) on the aggregated table, never the corpus."),

    "mase_seasonal_naive" -> Q(
      (s, d) => {
        import s.implicits._
        // Forecast-accuracy readout (MASE family): the lag-1 naive
        // forecast's absolute-error sum scaled by the lag-7 seasonal
        // naive's, per event-type daily series, both over the SAME
        // evaluation rows (day index ≥ 8, so the ratio of sums IS the
        // ratio of MAEs). Exact cents throughout; one truncating e6
        // division at the end. mase_e6 < 1e6 ⇒ the weekly pattern carries
        // real signal beyond persistence. Two lags share ONE per-series
        // window sort over the day-aggregated table.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"k").orderBy($"t")
        val bd = eventsTable(s, d)
          .groupBy($"event_type".as("k"),
            micros(date_trunc("day", $"ts")).as("t"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
          .withColumn("rn", row_number().over(w))
          .withColumn("l1", lag($"v", 1).over(w))
          .withColumn("l7", lag($"v", 7).over(w))
          .filter($"rn" >= 8)
        bd.groupBy($"k".as("event_type"))
          .agg(count(lit(1)).as("n_eval"),
            sum(abs($"v" - $"l1")).as("mae1_c"),
            sum(abs($"v" - $"l7")).as("mae7_c"))
          .withColumn("mase_e6",
            when($"mae7_c" === 0, 0L)
              .otherwise(idiv(
                $"mae1_c".cast(DecimalType(38, 0)) * 1000000L,
                $"mae7_c".cast(DecimalType(38, 0))).cast(LongType)))
          .orderBy($"event_type")
      },
      Some("""WITH bd AS (SELECT event_type AS k,
            epoch_us(date_trunc('day', ts)) AS t,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        lg AS (SELECT k, v,
            row_number() OVER w AS rn,
            lag(v, 1) OVER w AS l1, lag(v, 7) OVER w AS l7
          FROM bd WINDOW w AS (PARTITION BY k ORDER BY t)),
        ag AS (SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_eval,
            CAST(sum(abs(v - l1)) AS BIGINT) AS mae1_c,
            CAST(sum(abs(v - l7)) AS BIGINT) AS mae7_c
          FROM lg WHERE rn >= 8 GROUP BY 1)
        SELECT event_type, n_eval, mae1_c, mae7_c,
          CAST(CASE WHEN mae7_c = 0 THEN 0
            ELSE (CAST(mae1_c AS HUGEINT) * 1000000) // mae7_c END AS BIGINT) AS mase_e6
        FROM ag ORDER BY event_type"""),
      "MASE-family forecast accuracy: lag-1 naive error scaled by the " +
        "lag-7 seasonal naive over identical evaluation rows, exact cents, " +
        "one e6 division; both lags share one per-series window sort."),

    "shapley_attribution" -> Q(
      (s, d) => {
        import s.implicits._
        // EXACT Shapley-value attribution — the axiomatic capstone of the
        // attribution family (last-touch / position-based / Markov
        // removal): players = channels, v(S) = conversions among users
        // whose pre-first-purchase touch SET ⊆ S. With 4 channels the
        // value is exact (no permutation sampling): the corpus collapses
        // to ≤ 2⁴ (mask, conversions) rows in ONE distributed aggregate —
        // per-user bit flags via 5 conditional max's, one user-keyed
        // combine — and operators.Shapley runs the O(2ⁿ·n) zeta transform
        // + Shapley sum driver-side in exact BigInt, emitting 24·φ (n!·φ
        // is integral by construction). credit_e6 = φ's share of
        // 24·(v(N)−v(∅)) — the baseline no-touch conversions are never
        // attributed, exactly as the axioms demand.
        val channels = Seq("click", "error", "signup", "view")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"tsu", $"event_id")
        val ev = eventsTable(s, d)
          .filter($"event_type".isin(channels :+ "purchase": _*))
          .select($"user_id", $"event_id", micros($"ts").as("tsu"), $"event_type")
          .withColumn("cum_p",
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(w))
        val bitAggs = channels.zipWithIndex.map { case (ch, i) =>
          max(when($"event_type" === ch && $"cum_p" === 0L, 1L).otherwise(0L))
            .as(s"b$i")
        }
        val convAgg =
          max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv")
        val perUser = ev.groupBy($"user_id")
          .agg(bitAggs.head, (bitAggs.tail :+ convAgg): _*)
        val maskCounts = perUser.filter($"conv" === 1L)
          .select(($"b0" + $"b1" * 2 + $"b2" * 4 + $"b3" * 8).cast("int").as("mask"))
          .groupBy($"mask").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        val phi = graft.operators.Shapley.phiScaled(maskCounts, channels.size)
        val tot = phi.sum
        val out = channels.zip(phi).map { case (ch, p) =>
          (ch, p, if (tot == 0L) 0L else (BigInt(p) * 1000000L / tot).toLong)
        }
        out.toDF("channel", "phi24", "credit_e6").orderBy($"channel")
      },
      Some(shapleySql),
      "Exact (unsampled) Shapley attribution over the 4-channel touch-set " +
        "game: one distributed mask aggregate, O(2^n * n) exact-BigInt " +
        "driver solve, 24*phi integral by construction; oracle = generated " +
        "subset-lattice SQL replay."),

    "shapley_attribution_dummy" -> Q(
      (s, d) => {
        import s.implicits._
        // The Shapley DUMMY-PLAYER axiom as a runnable audit: re-run the
        // same game with a 5th channel no user ever touches ('webinar' —
        // absent from the corpus by construction). Its φ must be EXACTLY
        // zero and every real channel's 5!·φ must equal 5·(its 4-channel
        // 24·φ) — the invariance a sampled-permutation implementation
        // only approximates. Same one-aggregate corpus shape; the lattice
        // doubles to 2⁵ driver-side rows.
        val channels = Seq("click", "error", "signup", "view", "webinar")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"tsu", $"event_id")
        val ev = eventsTable(s, d)
          .filter($"event_type".isin(channels :+ "purchase": _*))
          .select($"user_id", $"event_id", micros($"ts").as("tsu"), $"event_type")
          .withColumn("cum_p",
            sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(w))
        val bitAggs = channels.zipWithIndex.map { case (ch, i) =>
          max(when($"event_type" === ch && $"cum_p" === 0L, 1L).otherwise(0L))
            .as(s"b$i")
        }
        val convAgg =
          max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv")
        val perUser = ev.groupBy($"user_id")
          .agg(bitAggs.head, (bitAggs.tail :+ convAgg): _*)
        val maskCounts = perUser.filter($"conv" === 1L)
          .select(($"b0" + $"b1" * 2 + $"b2" * 4 + $"b3" * 8 + $"b4" * 16)
            .cast("int").as("mask"))
          .groupBy($"mask").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        val phi = graft.operators.Shapley.phiScaled(maskCounts, channels.size)
        channels.zip(phi).map { case (ch, p) => (ch, p) }
          .toDF("channel", "phi120").orderBy($"channel")
      },
      Some(shapleyDummySql),
      "Dummy-player audit of the exact Shapley solve: an untouched 5th " +
        "channel gets exactly zero and real channels scale by 5!/4! = 5 — " +
        "the axiom a sampled implementation only approximates."),

    "ab_conversion_z2" -> Q(
      (s, d) => {
        import s.implicits._
        // Two-proportion z² for CONVERSION RATES — the rate companion to
        // ab_welch_t (values) and cuped_adjusted_ab (variance-reduced
        // values): arms by the deterministic user_id-parity rule,
        // conversion = any PREMIUM purchase (≥ $90 — every user in this
        // corpus buys something, so the plain any-purchase rate is the
        // degenerate C = N case; the threshold makes the rate a real
        // Bernoulli while the guard still covers the degenerate corpus).
        // The pooled two-proportion statistic is one EXACT rational —
        //   z² = (c₁n₂ − c₂n₁)²·N / (n₁·n₂·C·(N−C)),  C = c₁+c₂, N = n₁+n₂
        // — e6-floored once, every product in DECIMAL(38,0)/HUGEINT
        // (worst-case imbalance crosses 10³⁸ near ~4·10⁶ users; a null
        // product = Spark's silent decimal narrow, so the guard below
        // raises loudly exactly where DuckDB's HUGEINT would). Degenerate
        // arms (no conversions anywhere, or all converting) guard to 0 on
        // both engines instead of a NULL-vs-raise divergence. ONE
        // user-keyed combine + one global aggregate.
        val d38 = DecimalType(38, 0)
        val pu = eventsTable(s, d)
          .groupBy($"user_id")
          .agg(max(when($"event_type" === "purchase"
              && (dec2($"value") * 100).cast(LongType) >= 9000L, 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("tr", pmod($"user_id", lit(2L)))
        val st = pu.agg(
          sum(when($"tr" === 1L, 1L).otherwise(0L)).cast(d38).as("n1"),
          sum(when($"tr" === 1L, $"conv").otherwise(0L)).cast(d38).as("c1"),
          sum(when($"tr" === 0L, 1L).otherwise(0L)).cast(d38).as("n2"),
          sum(when($"tr" === 0L, $"conv").otherwise(0L)).cast(d38).as("c2"))
        val bigN = $"n1" + $"n2"
        val bigC = $"c1" + $"c2"
        val num = ($"c1" * $"n2" - $"c2" * $"n1")
        val den = $"n1" * $"n2" * bigC * (bigN - bigC)
        // null-product = DECIMAL(38,0) overflow (inputs never null): raise
        // loudly like DuckDB's HUGEINT does, instead of a silent NULL —
        // worst-case imbalance crosses 10^38 near ~4e6 users
        val zNum = lit(1000000L).cast(d38) * num * num * bigN
        val zGuarded = when(zNum.isNull || den.isNull, raise_error(lit(
            "ab_conversion_z2: DECIMAL(38,0) overflow - pre-scale the " +
              "counts (see scaladoc)")))
          .otherwise(idiv(zNum, den).cast(LongType))
        st.select(
          $"n1".cast(LongType).as("n_treat"),
          $"c1".cast(LongType).as("conv_treat"),
          $"n2".cast(LongType).as("n_ctrl"),
          $"c2".cast(LongType).as("conv_ctrl"),
          when(den === 0, 0L).otherwise(zGuarded).as("z2_e6"))
      },
      Some("""WITH pu AS (SELECT user_id,
            CAST(max(CASE WHEN event_type = 'purchase'
              AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 9000
              THEN 1 ELSE 0 END) AS HUGEINT) AS conv
          FROM events GROUP BY 1),
        st AS (SELECT
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
            sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS c1,
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
            sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS c2
          FROM pu)
        SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(c1 AS BIGINT) AS conv_treat,
          CAST(n2 AS BIGINT) AS n_ctrl, CAST(c2 AS BIGINT) AS conv_ctrl,
          CAST(CASE WHEN n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2) = 0 THEN 0
            ELSE (1000000 * (c1 * n2 - c2 * n1) * (c1 * n2 - c2 * n1) * (n1 + n2))
              // (n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)) END AS BIGINT) AS z2_e6
        FROM st"""),
      "Two-proportion conversion z^2 as one exact e6-floored rational " +
        "(pooled variance, parity arms, degenerate-arm guard) — the rate " +
        "companion to ab_welch_t and cuped_adjusted_ab.")
    ,

    "multiple_testing_bh" -> Q(
      (s, d) => {
        import s.implicits._
        // Benjamini-Hochberg FDR control over a FAMILY of tests — the
        // multiple-comparisons completion of the A/B family (ab_welch_t /
        // ab_conversion_z2 test ONE hypothesis; a real experimentation
        // platform runs dozens concurrently and must control the false
        // discovery rate across them). Family = 24 user-hash buckets (the
        // classic A/A calibration audit: every bucket SHOULD accept), each
        // bucket's premium-conversion rate tested against the REST via the
        // ab_conversion_z2 pooled two-proportion rational (arm g vs
        // complement is exactly the two-sample case). p-values enter as
        // the CHEBYSHEV bound p ≤ 1/z² (an exact rational — the normal CDF
        // would leave integer arithmetic; the bound is conservative and
        // ORDER-FAITHFUL, which is all BH consumes): p_e6 = min(10⁶,
        // 10¹² div max(z2_e6, 1)). The BH step-up is then pure windowing
        // on the O(arms) aggregate: rank ascending by (p, arm),
        // p_adj(i) = min_{j≥i} floor(p_j·m / j) capped at 10⁶, reject at
        // α = 0.05. Scale: ONE user-keyed combine + one 24-group
        // aggregate; the rank/suffix-min windows run on 24 post-agg rows.
        // DECIMAL(38,0) products guard loudly (10⁶·num²·N crosses 10³⁸
        // near ~10⁸ users — pre-scale the counts past that).
        val d38 = DecimalType(38, 0)
        val pu = eventsTable(s, d)
          .groupBy($"user_id")
          .agg(max(when($"event_type" === "purchase"
              && (dec2($"value") * 100).cast(LongType) >= 9000L, 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("arm", pmod($"user_id", lit(24L)))
        val byArm = pu.groupBy($"arm")
          .agg(count(lit(1)).cast(d38).as("n1"), sum($"conv").cast(d38).as("c1"))
        val tot = byArm.agg(sum($"n1").cast(d38).as("nn"), sum($"c1").cast(d38).as("cc"))
        val st = byArm.crossJoin(broadcast(tot))
          .select($"arm", $"n1", $"c1",
            ($"nn" - $"n1").as("n2"), ($"cc" - $"c1").as("c2"))
        val num = $"c1" * $"n2" - $"c2" * $"n1"
        val den = $"n1" * $"n2" * ($"c1" + $"c2") * ($"n1" + $"n2" - $"c1" - $"c2")
        val zNum = lit(1000000L).cast(d38) * num * num * ($"n1" + $"n2")
        val zGuarded = when(zNum.isNull || den.isNull, raise_error(lit(
            "multiple_testing_bh: DECIMAL(38,0) overflow - pre-scale the " +
              "counts (see scaladoc)")))
          .otherwise(idiv(zNum, den).cast(LongType))
        val z2 = st.select($"arm", $"n1".cast(LongType).as("n_users"),
            $"c1".cast(LongType).as("n_conv"),
            when(den === 0, 0L).otherwise(zGuarded).as("z2_e6"))
          .withColumn("p_e6", least(lit(1000000L),
            idiv(lit(1000000000000L), greatest($"z2_e6", lit(1L)))))
        // O(arms) frame from here: global windows are 24 rows, not corpus
        val wRank = org.apache.spark.sql.expressions.Window
          .orderBy($"p_e6", $"arm")
        val ranked = z2
          .withColumn("rnk", row_number().over(wRank).cast(LongType))
          .withColumn("m", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
        val wSuffix = org.apache.spark.sql.expressions.Window.orderBy($"rnk")
          .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        ranked
          .withColumn("p_adj_e6",
            min(least(lit(1000000L), idiv($"p_e6" * $"m", $"rnk"))).over(wSuffix))
          .select($"arm", $"n_users", $"n_conv", $"z2_e6", $"p_e6", $"rnk",
            $"p_adj_e6",
            when($"p_adj_e6" <= 50000L, 1L).otherwise(0L).as("reject"))
          .orderBy($"arm")
      },
      Some("""WITH pu AS (SELECT user_id,
            CAST(max(CASE WHEN event_type = 'purchase'
              AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 9000
              THEN 1 ELSE 0 END) AS HUGEINT) AS conv
          FROM events GROUP BY 1),
        a AS (SELECT user_id % 24 AS arm, CAST(count(*) AS HUGEINT) AS n1,
            sum(conv) AS c1 FROM pu GROUP BY 1),
        t AS (SELECT sum(n1) AS nn, sum(c1) AS cc FROM a),
        st AS (SELECT arm, n1, c1, (SELECT nn FROM t) - n1 AS n2,
            (SELECT cc FROM t) - c1 AS c2 FROM a),
        z AS (SELECT arm, CAST(n1 AS BIGINT) AS n_users, CAST(c1 AS BIGINT) AS n_conv,
            CAST(CASE WHEN n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2) = 0 THEN 0
              ELSE (1000000 * (c1 * n2 - c2 * n1) * (c1 * n2 - c2 * n1) * (n1 + n2))
                // (n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)) END AS BIGINT) AS z2_e6
          FROM st),
        p AS (SELECT arm, n_users, n_conv, z2_e6,
            least(1000000, 1000000000000 // greatest(z2_e6, 1)) AS p_e6 FROM z),
        r AS (SELECT arm, n_users, n_conv, z2_e6, p_e6,
            row_number() OVER (ORDER BY p_e6, arm) AS rnk,
            count(*) OVER () AS m FROM p),
        adj AS (SELECT *, min(least(1000000, (p_e6 * m) // rnk))
            OVER (ORDER BY rnk ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            AS p_adj_e6 FROM r)
        SELECT CAST(arm AS BIGINT) AS arm, n_users, n_conv, z2_e6,
          CAST(p_e6 AS BIGINT) AS p_e6, CAST(rnk AS BIGINT) AS rnk,
          CAST(p_adj_e6 AS BIGINT) AS p_adj_e6,
          CAST(CASE WHEN p_adj_e6 <= 50000 THEN 1 ELSE 0 END AS BIGINT) AS reject
        FROM adj ORDER BY arm"""),
      "Benjamini-Hochberg FDR over a 24-bucket A/A test family: per-bucket " +
        "two-proportion z^2 vs the rest (exact e6 rational), Chebyshev " +
        "p-bound 1/z^2 (order-faithful, integer-exact), BH step-up as " +
        "suffix-min windowing on the O(arms) aggregate."),

    "brown_forsythe_variance" -> Q(
      (s, d) => {
        import s.implicits._
        // Brown-Forsythe test (median-based Levene): DO THE ARMS' VARIANCES
        // differ — the heteroscedasticity check that decides whether
        // anova_oneway's equal-variance assumption holds (the classic
        // pre-test before pooling). W = one-way ANOVA F over the absolute
        // deviations z_ij = |x_ij − median_g|; the median (not the mean)
        // makes it robust to the heavy tails this corpus has. Exactness:
        // per-arm LOW median (smallest value whose inclusive cumulative
        // count reaches ceil(n_g/2)) from the O(distinct) PrefixSum rank
        // table — the kruskal_wallis/weighted_median discipline, no
        // corpus-wide sort — then z is pure integer cents, and the F on z
        // reuses anova_oneway's mirrored per-group floored S²/n terms
        // verbatim. Scale: one O(distinct) aggregate + prefix scan for the
        // medians, one broadcast of the O(arms) median map, two aggregates
        // for the F — never a per-row window over the corpus.
        val d38 = DecimalType(38, 0)
        val rows = eventsTable(s, d).select($"event_type".as("arm"),
          (dec2($"value") * 100).cast(LongType).as("vc"))
        val byVal = rows.groupBy($"arm", $"vc").agg(count(lit(1)).as("cnt"))
        val cum = graft.operators.PrefixSum
          .groupedRunningTotal(byVal, Seq("arm"), Seq(col("vc")), "cnt", "cum")
        val nArm = rows.groupBy($"arm").agg(count(lit(1)).as("n_g0"))
        val med = cum.join(broadcast(nArm), "arm")
          .filter($"cum" >= idiv($"n_g0" + 1L, lit(2L)))
          .groupBy($"arm").agg(min($"vc").as("med"))
        val z = rows.join(broadcast(med), "arm")
          .select($"arm", abs($"vc" - $"med").as("zc"))
        val g = z.groupBy($"arm")
          .agg(count(lit(1)).as("n_g"), sum($"zc").as("s_g"),
            sum($"zc".cast(d38) * $"zc".cast(d38)).as("ss_g"))
        def toLongGuarded(c: org.apache.spark.sql.Column, name: String) =
          when(abs(c) > lit(Long.MaxValue), raise_error(concat(
            lit(s"brown_forsythe_variance: $name overflows BIGINT: "),
            c.cast("string")))).otherwise(c).cast("long")
        val sg2 = $"s_g".cast(d38) * $"s_g".cast(d38)
        val sg2Guarded = when(
          sg2 > lit(Long.MaxValue).cast(d38) * $"n_g".cast(d38),
          raise_error(concat(
            lit("brown_forsythe_variance: per-group S_g^2/n_g overflows BIGINT: "),
            sg2.cast("string")))).otherwise(sg2)
        val agg = g.agg(
          count(lit(1)).as("k"), sum($"n_g").as("n"),
          sum($"s_g").as("s"), sum($"ss_g").as("ss"),
          sum(idiv(sg2Guarded, $"n_g".cast(d38)).cast(d38)).as("a"))
        agg.select($"k", $"n",
            toLongGuarded($"a" - idiv($"s".cast(d38) * $"s".cast(d38),
              $"n".cast(d38)).cast(d38), "ssb").as("ssb_z"),
            toLongGuarded($"ss" - $"a", "ssw").as("ssw_z"))
          .select($"k", $"n", $"ssb_z", $"ssw_z",
            idiv(lit(1000000L).cast(d38) * $"ssb_z".cast(d38) * ($"n" - $"k").cast(d38),
              greatest($"ssw_z".cast(d38) * ($"k" - 1).cast(d38), lit(1L).cast(d38)))
              .cast("long").as("w_e6"))
      },
      Some("""WITH r AS (SELECT event_type AS arm,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc FROM events),
          g0 AS (SELECT arm, count(*) AS n_g0 FROM r GROUP BY 1),
          bv AS (SELECT arm, vc, count(*) AS cnt FROM r GROUP BY 1, 2),
          c AS (SELECT arm, vc, sum(cnt) OVER (PARTITION BY arm ORDER BY vc) AS cum FROM bv),
          med AS (SELECT c.arm, min(vc) AS med
            FROM c JOIN g0 ON g0.arm = c.arm WHERE cum >= (n_g0 + 1) // 2 GROUP BY 1),
          z AS (SELECT r.arm, abs(vc - med) AS zc FROM r JOIN med ON med.arm = r.arm),
          g AS (SELECT arm, count(*) AS n_g, CAST(sum(zc) AS BIGINT) AS s_g,
              sum(CAST(zc AS HUGEINT) * zc) AS ss_g FROM z GROUP BY 1),
          t AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
              CAST(sum(s_g) AS BIGINT) AS s, sum(ss_g) AS ss,
              sum((CAST(s_g AS HUGEINT) * s_g) // n_g) AS a FROM g)
        SELECT k, n,
          CAST(a - (CAST(s AS HUGEINT) * s) // n AS BIGINT) AS ssb_z,
          CAST(ss - a AS BIGINT) AS ssw_z,
          CAST((1000000 * (a - (CAST(s AS HUGEINT) * s) // n) * (n - k))
            // greatest((ss - a) * (k - 1), 1) AS BIGINT) AS w_e6
        FROM t"""),
      "Brown-Forsythe (median-based Levene) variance-equality W: per-arm " +
        "low median from the O(distinct) PrefixSum rank table, integer " +
        "|x - med| deviations, anova_oneway's mirrored floored F on z — " +
        "the heteroscedasticity pre-test for the ANOVA family."),

    "ar2_yule_walker" -> Q(
      (s, d) => {
        import s.implicits._
        // AR(2) fit by Yule-Walker over the daily order-count series — the
        // parametric completion of the time-series family (autocorr_lags
        // EXPOSES the autocovariances; this SOLVES them: the 2×2 Toeplitz
        // system has the closed form φ₁ = c₁(c₀−c₂)/(c₀²−c₁²),
        // φ₂ = (c₀c₂−c₁²)/(c₀²−c₁²), both exact rationals e6-floored
        // once). Integer discipline: the series is demeaned by the FLOORED
        // mean (z_t = c_t − S div n — a well-defined estimator both
        // engines replay bit-for-bit; the sub-1 residual mean perturbs c_k
        // identically on both sides), autocovariances are raw integer
        // products c_k = Σ z_t·z_{t+k}, and the one-step forecast re-enters
        // as x̂_{n+1}·10⁶ = 10⁶·μ + φ₁ᵉ⁶·z_n + φ₂ᵉ⁶·z_{n−1}. Negative
        // products divide identically (Spark IntegralDivide ≡ DuckDB `//`:
        // both TRUNCATE — the measured holt_linear semantic). Scale: one
        // day-keyed count aggregate; the lead window runs over the O(days)
        // aggregate, and counts keep c₀² inside DECIMAL(38,0) to ~10⁸
        // orders/day (the loud null-guard raises past that).
        val d38 = DecimalType(38, 0)
        val days = table(s, d, "orders")
          .groupBy($"o_orderdate".as("day")).agg(count(lit(1)).as("c"))
        val tot = days.agg(count(lit(1)).as("n"), sum($"c").as("sm"))
        val wDay = org.apache.spark.sql.expressions.Window.orderBy($"day")
        // O(days) post-aggregation frame: global window is ~2.4k rows
        val z = days.crossJoin(broadcast(tot))
          .select($"day", ($"c" - idiv($"sm", $"n")).as("z"), $"n",
            idiv($"sm", $"n").as("mu"))
          .withColumn("rn", row_number().over(wDay).cast(LongType))
          .withColumn("z1", lead($"z", 1).over(wDay))
          .withColumn("z2", lead($"z", 2).over(wDay))
        val cst = z.groupBy($"n", $"mu").agg(
          sum($"z".cast(d38) * $"z".cast(d38)).as("c0"),
          sum(when($"z1".isNotNull, $"z".cast(d38) * $"z1".cast(d38))).as("c1"),
          sum(when($"z2".isNotNull, $"z".cast(d38) * $"z2".cast(d38))).as("c2"),
          max_by($"z", $"rn").as("zlast"),
          max_by($"z", when($"z1".isNotNull, $"rn")).as("zprev"))
        val den = $"c0" * $"c0" - $"c1" * $"c1"
        def phi(numE6: org.apache.spark.sql.Column, name: String) = {
          val guarded = when(numE6.isNull || den.isNull, raise_error(lit(
              s"ar2_yule_walker: DECIMAL(38,0) overflow in $name - " +
                "pre-scale the series (see scaladoc)")))
            .otherwise(idiv(numE6, den).cast(LongType))
          when(den === 0, 0L).otherwise(guarded)
        }
        cst.select(
            $"n", $"mu",
            $"c0".cast(LongType).as("c0"), $"c1".cast(LongType).as("c1"),
            $"c2".cast(LongType).as("c2"),
            phi(lit(1000000L).cast(d38) * $"c1" * ($"c0" - $"c2"), "phi1")
              .as("phi1_e6"),
            phi(lit(1000000L).cast(d38) * ($"c0" * $"c2" - $"c1" * $"c1"), "phi2")
              .as("phi2_e6"),
            $"zlast", $"zprev")
          .select($"n", $"mu", $"c0", $"c1", $"c2", $"phi1_e6", $"phi2_e6",
            (lit(1000000L) * $"mu" + $"phi1_e6" * $"zlast"
              + $"phi2_e6" * $"zprev").as("forecast_e6"))
      },
      Some("""WITH dcnt AS (SELECT o_orderdate AS day, count(*) AS c
            FROM orders GROUP BY 1),
          t AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sm FROM dcnt),
          z0 AS (SELECT day, c - (SELECT sm FROM t) // (SELECT n FROM t) AS z,
              row_number() OVER (ORDER BY day) AS rn FROM dcnt),
          zl AS (SELECT z, rn, lead(z, 1) OVER (ORDER BY rn) AS z1,
              lead(z, 2) OVER (ORDER BY rn) AS z2 FROM z0),
          cst AS (SELECT
              sum(CAST(z AS HUGEINT) * z) AS c0,
              sum(CASE WHEN z1 IS NOT NULL THEN CAST(z AS HUGEINT) * z1 END) AS c1,
              sum(CASE WHEN z2 IS NOT NULL THEN CAST(z AS HUGEINT) * z2 END) AS c2,
              max_by(z, rn) AS zlast,
              max_by(z, CASE WHEN z1 IS NOT NULL THEN rn END) AS zprev FROM zl),
          f AS (SELECT (SELECT n FROM t) AS n,
              (SELECT sm FROM t) // (SELECT n FROM t) AS mu,
              CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
              CAST(c2 AS BIGINT) AS c2,
              CASE WHEN c0 * c0 - c1 * c1 = 0 THEN 0
                ELSE CAST((1000000 * c1 * (c0 - c2)) // (c0 * c0 - c1 * c1) AS BIGINT)
                END AS phi1_e6,
              CASE WHEN c0 * c0 - c1 * c1 = 0 THEN 0
                ELSE CAST((1000000 * (c0 * c2 - c1 * c1)) // (c0 * c0 - c1 * c1) AS BIGINT)
                END AS phi2_e6,
              zlast, zprev FROM cst)
        SELECT n, mu, c0, c1, c2, phi1_e6, phi2_e6,
          1000000 * mu + phi1_e6 * zlast + phi2_e6 * zprev AS forecast_e6
        FROM f"""),
      "AR(2) Yule-Walker fit over daily order counts: floored-mean integer " +
        "demeaning, raw integer autocovariances, closed-form Toeplitz solve " +
        "as two e6-floored exact rationals, one-step forecast re-entry — " +
        "one day-keyed aggregate + an O(days) lead window."),

    "croston_intermittent" -> Q(
      (s, d) => {
        import s.implicits._
        // Croston's method over per-part daily demand — the INTERMITTENT
        // series the Holt/Holt-Winters family cannot forecast (a spare
        // part sells on ~3% of days; a plain EWMA decays to zero between
        // demands). Two integer EWMAs over demand OCCURRENCES only (sizes
        // and inter-demand intervals), rate = z/p as one e6 division; the
        // keyed secondary-sort fold (operators.Croston) replays as a
        // per-series recursive CTE like holt_linear_smoothing. Scale: the
        // fold input is the (part, demand-day) aggregate — corpus-sized
        // work is that one groupBy; each key's fold is its demand count.
        val day = 86400000000L
        val demands = table(s, d, "lineitem")
          .groupBy($"l_partkey", idiv(micros($"l_shipdate"), lit(day)).as("t"))
          .agg(sum($"l_quantity".cast("long")).as("v"))
          .select($"l_partkey".cast("string").as("k"), $"t", $"v")
        graft.operators.Croston.forecast(demands).orderBy($"k", $"t")
      },
      Some(crostonOracleSql),
      "Croston intermittent-demand forecast per part: size and interval " +
        "EWMAs over demand occurrences only (alpha=1/5, integer quot), " +
        "e6 demand rate — the keyed O(1)-state fold, recursive-CTE " +
        "bit replay."),

    "dtw_series_distance" -> Q(
      (s, d) => {
        import s.implicits._
        // Dynamic Time Warping between every pair of nations' MONTHLY
        // revenue series — the alignment-tolerant series similarity
        // (cross_correlation scores fixed lags; DTW finds the best
        // monotone alignment, so a nation whose seasonality runs a month
        // late still matches). Exact integer DP per pair
        // (operators.Dtw): costs |a_i − b_j| in cents, O(L²) per pair
        // with L = months — calendar-bounded, never corpus-bounded; the
        // oracle replays the SAME cell order with the DP row as a LIST
        // column in a recursive CTE rebuilt by a left-to-right
        // list_reduce. Missing months would collapse out identically on
        // both sides (ordered sequences, no gap fill).
        val ser = table(s, d, "orders")
          .join(table(s, d, "customer"), $"o_custkey" === $"c_custkey")
          .groupBy($"c_nationkey".cast("long").as("id"),
            (year($"o_orderdate") * 12 + month($"o_orderdate")).as("mi"))
          .agg(sum((dec2($"o_totalprice") * 100).cast("long")).as("v"))
          .groupBy($"id")
          .agg(transform(array_sort(collect_list(struct($"mi", $"v"))),
            x => x.getField("v")).as("vs"))
        graft.operators.Dtw.pairDistances(ser)
      },
      Some("""WITH RECURSIVE mrev AS (SELECT CAST(c_nationkey AS BIGINT) AS id,
            year(o_orderdate) * 12 + month(o_orderdate) AS mi,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        ser AS (SELECT id, list(v ORDER BY mi) AS vs FROM mrev GROUP BY 1),
        pr AS (SELECT a.id AS id_a, b.id AS id_b, a.vs AS va, b.vs AS vb
          FROM ser a JOIN ser b ON a.id < b.id),
        d AS (
          SELECT id_a, id_b, va, vb, 1 AS i,
            list_reduce(
              list_prepend([abs(va[1] - vb[1])],
                list_transform(generate_series(2, len(vb)), j -> [j])),
              (acc, e) -> list_append(acc,
                acc[len(acc)] + abs(va[1] - vb[e[1]]))) AS row
          FROM pr
          UNION ALL
          SELECT id_a, id_b, va, vb, i + 1,
            list_reduce(
              list_prepend([row[1] + abs(va[i + 1] - vb[1])],
                list_transform(generate_series(2, len(vb)), j -> [j])),
              (acc, e) -> list_append(acc, abs(va[i + 1] - vb[e[1]])
                + least(acc[len(acc)], row[e[1]], row[e[1] - 1])))
          FROM d WHERE i < len(va))
        SELECT id_a, id_b, row[len(vb)] AS dtw_cost
        FROM d WHERE i = len(va) ORDER BY id_a, id_b"""),
      "All-pairs DTW over monthly nation revenue: exact integer O(L^2) DP " +
        "per pair (mapPartitions state, calendar-bounded L), replayed " +
        "cell-for-cell by a recursive CTE carrying the DP row as a list."),

    "forecast_backtest" -> Q(
      (s, d) => {
        import s.implicits._
        // ROLLING one-step-ahead forecast BACKTEST — the evaluation
        // harness that decides WHICH forecaster a series gets
        // (mase_seasonal_naive scores one method against a fixed naive at
        // a fixed split; this scores the Holt fold against the naive at
        // EVERY origin): day t's forecast1 (made at t, for t+1) compares
        // to the realized v_{t+1}, the naive's forecast for t+1 is v_t.
        // Errors are exact integer cents; per-series MAE e6 plus the
        // win flag. Reuses the exact same Holt fold the smoothing row
        // registers, so the oracle is the shared recursive CTE wrapped as
        // a subquery — one definition, three gated surfaces. Scale: the
        // lead window and the error aggregate run over the O(series×days)
        // day table; corpus-sized work is the one upstream aggregate.
        val d38 = DecimalType(38, 0)
        val byDay = eventsTable(s, d)
          .groupBy($"event_type".as("k"),
            micros(date_trunc("day", $"ts")).as("t"))
          .agg(sum((dec2($"value") * 100).cast(LongType)).as("v"))
        val sm = graft.operators.HoltLinear.smooth(byDay)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"k").orderBy($"t")
        sm.withColumn("v_next", lead($"v", 1).over(w))
          .filter($"v_next".isNotNull)
          .groupBy($"k".as("event_type"))
          .agg(count(lit(1)).as("n_origins"),
            sum(abs($"v_next" - $"forecast1")).as("holt_abs_err_c"),
            sum(abs($"v_next" - $"v")).as("naive_abs_err_c"))
          .select($"event_type", $"n_origins", $"holt_abs_err_c",
            $"naive_abs_err_c",
            idiv(lit(1000000L).cast(d38) * $"holt_abs_err_c".cast(d38),
              $"n_origins".cast(d38)).cast(LongType).as("holt_mae_e6"),
            idiv(lit(1000000L).cast(d38) * $"naive_abs_err_c".cast(d38),
              $"n_origins".cast(d38)).cast(LongType).as("naive_mae_e6"),
            when($"holt_abs_err_c" <= $"naive_abs_err_c", 1L).otherwise(0L)
              .as("holt_wins"))
          .orderBy($"event_type")
      },
      Some(s"""WITH sm AS (SELECT * FROM ($holtOracleSql)),
        nx AS (SELECT event_type, v_c, forecast1_c,
            lead(v_c, 1) OVER (PARTITION BY event_type ORDER BY day_us) AS v_next
          FROM sm),
        ag AS (SELECT event_type, count(*) AS n_origins,
            CAST(sum(abs(v_next - forecast1_c)) AS BIGINT) AS holt_abs_err_c,
            CAST(sum(abs(v_next - v_c)) AS BIGINT) AS naive_abs_err_c
          FROM nx WHERE v_next IS NOT NULL GROUP BY 1)
        SELECT event_type, n_origins, holt_abs_err_c, naive_abs_err_c,
          CAST((1000000 * CAST(holt_abs_err_c AS HUGEINT)) // n_origins AS BIGINT)
            AS holt_mae_e6,
          CAST((1000000 * CAST(naive_abs_err_c AS HUGEINT)) // n_origins AS BIGINT)
            AS naive_mae_e6,
          CAST(CASE WHEN holt_abs_err_c <= naive_abs_err_c THEN 1 ELSE 0 END
            AS BIGINT) AS holt_wins
        FROM ag ORDER BY event_type"""),
      "Rolling one-step forecast backtest: the Holt fold's forecast1 vs " +
        "the naive at every origin, exact integer errors, per-series e6 " +
        "MAE + win flag — the same fold and recursive-CTE oracle as the " +
        "smoothing row, wrapped as one evaluation query.")
    ,

    "sprt_sequential_test" -> Q(
      (s, d) => {
        import s.implicits._
        // Wald's SEQUENTIAL probability ratio test — the sequential member
        // completing the A/B family (ab_conversion_z2 is the fixed-horizon
        // test, multiple_testing_bh the multiplicity control; SPRT answers
        // "when can this experiment STOP?"): the premium-conversion stream
        // is monitored day by day, the cumulative log-likelihood ratio
        //   llr = C·ln(p1/p0) + (N−C)·ln((1−p1)/(1−p0))
        // walks between Wald's boundaries ln(β/(1−α)) and ln((1−β)/α),
        // and the first crossing is the decision day. Integer discipline
        // for the transcendental constants: the four logs are computed
        // ONCE in Scala, rounded to e6 integers, and inlined verbatim into
        // both the Spark plan and the oracle SQL (the multimodal_phash
        // basis discipline) — llr is then exact BIGINT arithmetic. Scale:
        // one day-keyed aggregate; the cumulative window runs over the
        // O(days) day table.
        val ev = eventsTable(s, d)
          .select(micros(date_trunc("day", $"ts")).as("day_us"),
            when($"event_type" === "purchase"
              && (dec2($"value") * 100).cast(LongType) >= 9000L, 1L)
              .otherwise(0L).as("conv"))
          .groupBy($"day_us")
          .agg(count(lit(1)).as("n_d"), sum($"conv").as("c_d"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"day_us")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        // O(days) post-aggregation frame: the global window is ~2.4k rows
        ev.withColumn("n_cum", sum($"n_d").over(w))
          .withColumn("c_cum", sum($"c_d").over(w))
          .select($"day_us", $"n_cum", $"c_cum",
            ($"c_cum" * SprtL1E6 + ($"n_cum" - $"c_cum") * SprtL0E6).as("llr_e6"))
          .withColumn("verdict",
            when($"llr_e6" >= SprtAE6, lit("accept_h1"))
              .when($"llr_e6" <= SprtBE6, lit("accept_h0"))
              .otherwise(lit("continue")))
          .orderBy($"day_us")
      },
      Some(s"""WITH bd AS (SELECT epoch_us(date_trunc('day', ts)) AS day_us,
            count(*) AS n_d,
            sum(CASE WHEN event_type = 'purchase'
              AND CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 9000
              THEN 1 ELSE 0 END) AS c_d
          FROM events GROUP BY 1),
        cu AS (SELECT day_us,
            CAST(sum(n_d) OVER (ORDER BY day_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum,
            CAST(sum(c_d) OVER (ORDER BY day_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c_cum
          FROM bd),
        ll AS (SELECT day_us, n_cum, c_cum,
            c_cum * $SprtL1E6 + (n_cum - c_cum) * ($SprtL0E6) AS llr_e6
          FROM cu)
        SELECT day_us, n_cum, c_cum, llr_e6,
          CASE WHEN llr_e6 >= $SprtAE6 THEN 'accept_h1'
            WHEN llr_e6 <= $SprtBE6 THEN 'accept_h0'
            ELSE 'continue' END AS verdict
        FROM ll ORDER BY day_us"""),
      "Wald SPRT on the daily conversion stream: cumulative integer LLR " +
        "with e6 log-constants inlined verbatim into both engines (no " +
        "cross-engine libm), Wald boundaries, per-day verdict — the " +
        "sequential-stopping member of the A/B family.")
    )

  /** SPRT constants (sprt_sequential_test): H0 p₀=0.02 vs H1 p₁=0.04 at
    * α=β=0.05 — the four transcendental logs e6-rounded ONCE here and
    * inlined verbatim into BOTH the Spark plan and the oracle SQL, so the
    * engines share identical integers (the multimodal_phash basis
    * discipline; no cross-engine libm). */
  private lazy val SprtL1E6: Long = math.round(math.log(0.04 / 0.02) * 1e6) //  693147
  private lazy val SprtL0E6: Long = math.round(math.log(0.96 / 0.98) * 1e6) //  -20619
  private lazy val SprtAE6: Long = math.round(math.log(0.95 / 0.05) * 1e6)  // 2944439
  private lazy val SprtBE6: Long = math.round(math.log(0.05 / 0.95) * 1e6)  // -2944439

  /** Shared by croston_intermittent AND streaming_croston_forecast (the
    * streamed fold is row-identical by construction): the per-series
    * recursive-CTE replay of the two demand-occurrence EWMAs. */
  private[queries] lazy val crostonOracleSql: String =
    """WITH RECURSIVE bd AS (SELECT CAST(l_partkey AS VARCHAR) AS k,
          epoch_us(l_shipdate) // 86400000000 AS t,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
        FROM lineitem GROUP BY 1, 2),
      rd AS (SELECT k, t, v, row_number() OVER (PARTITION BY k ORDER BY t) AS rn,
          lag(t) OVER (PARTITION BY k ORDER BY t) AS tp FROM bd),
      h AS (
        SELECT k, rn, t, v, CAST(1 AS BIGINT) AS q, v AS z, CAST(1 AS BIGINT) AS p
        FROM rd WHERE rn = 1
        UNION ALL
        SELECT rd.k, rd.rn, rd.t, rd.v, rd.t - rd.tp,
          (rd.v + 4 * h.z) // 5, ((rd.t - rd.tp) + 4 * h.p) // 5
        FROM h JOIN rd ON rd.k = h.k AND rd.rn = h.rn + 1)
      SELECT k, t, v, q, z AS size_z, p AS interval_p,
        (1000000 * z) // greatest(p, 1) AS rate_e6
      FROM h ORDER BY k, t"""

  /** Shared by holt_winters_additive AND streaming_holt_winters (the
    * streamed fold is row-identical by construction): recursive CTE
    * carrying the 7-slot seasonal ring as a list column. The recursive
    * member's `ring` output is the POST-state ([s_{rn−6} … s_{rn}]), so
    * the lookback is ring[1] of the PARENT row and the one-step forecast
    * reads ring[1] of the row itself. */
  private[queries] lazy val holtWintersOracleSql: String =
    """WITH RECURSIVE bd AS (SELECT event_type AS k,
            epoch_us(date_trunc('day', ts)) AS t,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        rd AS (SELECT k, t, v, row_number() OVER (PARTITION BY k ORDER BY t) AS rn FROM bd),
        h AS (
          SELECT k, rn, t, v, v AS level, CAST(0 AS BIGINT) AS trend,
            CAST(0 AS BIGINT) AS seasonal,
            [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS ring
          FROM rd WHERE rn = 1
          UNION ALL
          SELECT k, rn, t, v, level, trend, seasonal, ring[2:7] || [seasonal]
          FROM (
            SELECT rd.k, rd.rn, rd.t, rd.v, h.ring,
              ((rd.v - h.ring[1]) + 4 * (h.level + h.trend)) // 5 AS level,
              ((((rd.v - h.ring[1]) + 4 * (h.level + h.trend)) // 5)
                - h.level + 9 * h.trend) // 10 AS trend,
              ((rd.v - (((rd.v - h.ring[1]) + 4 * (h.level + h.trend)) // 5))
                + 3 * h.ring[1]) // 4 AS seasonal
            FROM h JOIN rd ON rd.k = h.k AND rd.rn = h.rn + 1))
        SELECT k AS event_type, t AS day_us, v AS v_c, level AS level_c,
          trend AS trend_c, seasonal AS seasonal_c,
          CAST(level + trend + ring[1] AS BIGINT) AS forecast1_c
        FROM h ORDER BY event_type, day_us"""

  /** The Holt linear recursive-CTE oracle — shared verbatim by the batch
    * fold (holt_linear_smoothing) and its streaming twin
    * (streaming_holt_forecast), which are row-identical by construction.
    */
  private[queries] lazy val holtOracleSql: String =
    """WITH RECURSIVE bd AS (SELECT event_type AS k,
            epoch_us(date_trunc('day', ts)) AS t,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        rd AS (SELECT k, t, v, row_number() OVER (PARTITION BY k ORDER BY t) AS rn FROM bd),
        h AS (
          SELECT k, rn, t, v, v AS level, CAST(0 AS BIGINT) AS trend
          FROM rd WHERE rn = 1
          UNION ALL
          SELECT rd.k, rd.rn, rd.t, rd.v,
            (rd.v + 4 * (h.level + h.trend)) // 5,
            (((rd.v + 4 * (h.level + h.trend)) // 5) - h.level + 9 * h.trend) // 10
          FROM h JOIN rd ON rd.k = h.k AND rd.rn = h.rn + 1)
        SELECT k AS event_type, t AS day_us, v AS v_c, level AS level_c,
          trend AS trend_c, level + trend AS forecast1_c
        FROM h ORDER BY event_type, day_us"""

  /** Generated subset-lattice SQL replaying operators.Shapley exactly:
    * per-user bit flags → conv-mask counts → v(S) over the 2ⁿ lattice via
    * the mask|S = S containment test → the n!·φ sum as a literal
    * (channel, S∪{i}, S, |S|!(n−|S|−1)!) term table. Everything integral.
    */
  private def shapleyOracle(channels: Seq[String], withCredit: Boolean): String = {
    val n = channels.size
    val full = 1 << n
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val bitCases = channels.zipWithIndex.map { case (ch, i) =>
      s"max(CASE WHEN event_type = '$ch' AND cum_p = 0 THEN 1 ELSE 0 END) AS b$i"
    }.mkString(",\n            ")
    val maskExpr = channels.indices.map(i => s"${1 << i} * b$i").mkString(" + ")
    val subsetVals = (0 until full).map(s => s"($s)").mkString(", ")
    val terms = (for {
      i <- channels.indices
      s <- 0 until full if (s & (1 << i)) == 0
    } yield {
      val size = Integer.bitCount(s)
      s"('${channels(i)}', ${s | (1 << i)}, $s, ${fact(size) * fact(n - size - 1)})"
    }).mkString(",\n            ")
    val inList = (channels :+ "purchase").map(c => s"'$c'").mkString(",")
    val phiCol = s"phi${fact(n)}"
    val finalSel =
      if (withCredit)
        s"""tot AS (SELECT CAST(sum($phiCol) AS BIGINT) AS t FROM res)
        SELECT channel, $phiCol,
          CASE WHEN (SELECT t FROM tot) = 0 THEN 0
            ELSE CAST((CAST($phiCol AS HUGEINT) * 1000000)
              // (SELECT t FROM tot) AS BIGINT) END AS credit_e6
        FROM res ORDER BY channel"""
      else s"""dummy_tail AS (SELECT 1)
        SELECT channel, $phiCol FROM res ORDER BY channel"""
    s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
          FROM events WHERE event_type IN ($inList)),
        cum AS (SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS cum_p FROM ev),
        pu AS (SELECT user_id,
            $bitCases,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          FROM cum GROUP BY 1),
        cm AS (SELECT $maskExpr AS mask, CAST(count(*) AS BIGINT) AS n
          FROM pu WHERE conv = 1 GROUP BY 1),
        vs AS (SELECT ss.s AS s,
            coalesce(sum(CASE WHEN (cm.mask | ss.s) = ss.s THEN cm.n ELSE 0 END), 0) AS v
          FROM (VALUES $subsetVals) ss(s) LEFT JOIN cm ON true GROUP BY 1),
        res AS (SELECT t.ch AS channel,
            CAST(sum(t.w * (va.v - vb.v)) AS BIGINT) AS $phiCol
          FROM (VALUES
            $terms) t(ch, sbig, ssmall, w)
          JOIN vs va ON va.s = t.sbig JOIN vs vb ON vb.s = t.ssmall
          GROUP BY 1),
        $finalSel"""
  }

  private lazy val shapleySql: String =
    shapleyOracle(Seq("click", "error", "signup", "view"), withCredit = true)

  private lazy val shapleyDummySql: String =
    shapleyOracle(Seq("click", "error", "signup", "view", "webinar"), withCredit = false)

  /** Unrolled SQL for markov_attribution_removal: the journey/transition
    * derivation plus K=4 absorption iterations for the base chain and each
    * single-channel-removed variant, mirroring MarkovAbsorb bit-for-bit.
    * Generated (not hand-written) because the 5 variants × 4 iterations are
    * mechanically identical CTE blocks.
    */
  private lazy val markovRemovalSql: String = {
    val channels = Seq("click", "error", "signup", "view")
    val scale = 1000000L
    def iterBlock(v: String, k: Int): String = {
      val pj =
        if (k == 1) s"CASE WHEN c.j = 'CONV' THEN $scale ELSE 0 END"
        else s"CASE WHEN c.j = 'CONV' THEN $scale ELSE coalesce(p.p, 0) END"
      val joinPrev =
        if (k == 1) "" else s" LEFT JOIN p${k - 1}_$v p ON p.st = c.j"
      s"""p${k}_$v AS (SELECT c.i AS st,
         CAST(sum(CAST(c.cij AS HUGEINT) * ($pj)) // min(ci.ci) AS BIGINT) AS p
         FROM c_$v c JOIN ci_$v ci ON c.i = ci.i$joinPrev GROUP BY c.i)"""
    }
    def variant(v: String, cDef: String): String =
      (s"c_$v AS ($cDef)" ::
        s"ci_$v AS (SELECT i, CAST(sum(cij) AS BIGINT) AS ci FROM c_$v GROUP BY 1)" ::
        (1 to 4).map(k => iterBlock(v, k)).toList).mkString(",\n")
    val baseDef = "SELECT i, j, cij FROM c0"
    def removedDef(x: String): String =
      s"""SELECT i, CASE WHEN j = '$x' THEN 'NULL' ELSE j END AS j,
          CAST(sum(cij) AS BIGINT) AS cij FROM c0 WHERE i <> '$x' GROUP BY 1, 2"""
    val reUnion = channels.map { x =>
      s"""SELECT '$x' AS channel,
          (SELECT p FROM p4_base WHERE st = 'START')
            - coalesce((SELECT p FROM p4_$x WHERE st = 'START'), 0) AS re"""
    }.mkString("\n UNION ALL ")
    s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
          FROM events
          WHERE event_type IN ('click','error','signup','view','purchase')),
        cum AS (SELECT *, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS cum_p FROM ev),
        j AS (SELECT user_id, tsu, event_id,
            CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS state
          FROM cum WHERE cum_p = 0 OR (event_type = 'purchase' AND cum_p = 1)),
        steps AS (SELECT coalesce(lag(state) OVER
            (PARTITION BY user_id ORDER BY tsu, event_id), 'START') AS i,
            state AS j FROM j),
        tl AS (SELECT user_id, state,
            row_number() OVER (PARTITION BY user_id ORDER BY tsu DESC, event_id DESC) AS rn
          FROM j),
        tails AS (SELECT state AS i, 'NULL' AS j FROM tl WHERE rn = 1 AND state <> 'CONV'),
        c0 AS (SELECT i, j, CAST(count(*) AS BIGINT) AS cij FROM
          (SELECT i, j FROM steps UNION ALL SELECT i, j FROM tails) u GROUP BY 1, 2),
        ${variant("base", baseDef)},
        ${channels.map(x => variant(x, removedDef(x))).mkString(",\n")},
        res AS ($reUnion),
        tot AS (SELECT CAST(sum(CASE WHEN re > 0 THEN re ELSE 0 END) AS BIGINT) AS t FROM res)
        SELECT channel, CAST(re AS BIGINT) AS removal_effect_e6,
          CASE WHEN (SELECT t FROM tot) = 0 THEN 0
            ELSE CAST((CAST(greatest(re, 0) AS HUGEINT) * 1000000)
              // (SELECT t FROM tot) AS BIGINT) END AS credit_e6
        FROM res ORDER BY channel"""
  }
}
