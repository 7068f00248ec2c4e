package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical analytics from EXACT moments: Pearson correlation and
  * per-group OLS trend fitting. The shared determinism recipe (same as
  * [[Insights.valueOutliers]]): every sum that crosses a shuffle is a
  * DECIMAL aggregate (order-independent, engine-exact), and the final
  * statistic is ONE fixed IEEE expression over those exact moments —
  * so a 6dp-rounded r or slope is bit-identical on any engine and any
  * partitioning. Spark's built-in `corr`/`regr_slope` sum DOUBLES in
  * partition order and cannot make that guarantee; at 1000 executors
  * the moment-based form is also one partial-aggregate pass, identical
  * in cost. */
object Stats {

  private def money(c: Column): Column = c.cast("decimal(12,2)")

  /** Pearson correlation over lineitem column pairs
    * (quantity↔extendedprice, quantity↔discount,
    * extendedprice↔discount). One single-row aggregate computes all
    * nine exact moments in one scan pass; the three output rows are
    * projections of that row (no second scan, no per-pair jobs).
    * r = (n·sxy − sx·sy) / √((n·sxx − sx²)(n·syy − sy²)). */
  def numericCorrelations(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(
      money(col("l_quantity")).as("q"),
      money(col("l_extendedprice")).as("p"),
      money(col("l_discount")).as("d"))
    val m = li.agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"), sum(col("d")).as("sd"),
      sum(col("q") * col("q")).as("sqq"), sum(col("p") * col("p")).as("spp"),
      sum(col("d") * col("d")).as("sdd"), sum(col("q") * col("p")).as("sqp"),
      sum(col("q") * col("d")).as("sqd"), sum(col("p") * col("d")).as("spd"))
    // all three pair rows project from the ONE aggregate row via an
    // exploded struct array — a 3-way union of selects over `m` would
    // plan the scan+aggregate three times unless exchange reuse
    // happens to fire
    def rOf(sx: String, sy: String, sxx: String, syy: String,
            sxy: String): Column = {
      val n = col("n").cast("double")
      def d(c: String): Column = col(c).cast("double")
      val num = n * d(sxy) - d(sx) * d(sy)
      val den = sqrt((n * d(sxx) - d(sx) * d(sx)) * (n * d(syy) - d(sy) * d(sy)))
      round(num / den, 6)
    }
    m.select(col("n"), explode(array(
        struct(lit("quantity_extendedprice").as("pair"),
          rOf("sq", "sp", "sqq", "spp", "sqp").as("r")),
        struct(lit("quantity_discount").as("pair"),
          rOf("sq", "sd", "sqq", "sdd", "sqd").as("r")),
        struct(lit("extendedprice_discount").as("pair"),
          rOf("sp", "sd", "spp", "sdd", "spd").as("r")))).as("x"))
      .select(col("x.pair").as("pair"), col("n"), col("x.r").as("r"))
      .orderBy(col("pair"))
  }

  /** Per-nation OLS trend of monthly order revenue: regress the exact
    * monthly revenue on the month index (months since 1995-01) and
    * report slope + intercept. Two-level aggregation — (nation, month)
    * revenue first (the only fact-sized shuffle), then per-nation
    * moments over the tiny monthly frame; customer/nation dims
    * broadcast. Month indexes and their squares are integers, revenue
    * moments exact decimal, slope/intercept one IEEE expression. */
  def revenueTrendSlopes(s: SparkSession, dir: String): DataFrame = {
    val monthly = monthlyRevenue(s, dir)
    val m = monthly.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum(col("rev")).as("sy"),
        sum(col("rev") * col("x")).as("sxy"))
      .filter(col("n") >= 2)
    val n = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val slope = (n * d("sxy") - d("sx") * d("sy")) /
      (n * d("sxx") - d("sx") * d("sx"))
    m.select(col("n_name"), col("n").as("n_months"),
        round(slope, 4).as("slope"),
        round((d("sy") - slope * d("sx")) / n, 4).as("intercept"))
      .orderBy(col("n_name"))
  }

  /** Theil–Sen robust trend per nation — the median of all pairwise
    * monthly-revenue slopes, the robust sibling of
    * [[revenueTrendSlopes]]' OLS exactly as `value_mad_outliers` is
    * of the mean/std outliers: a single wild month drags an OLS slope
    * arbitrarily but moves the pairwise-slope MEDIAN by at most one
    * rank. The pair enumeration is per-nation over the MONTHLY frame —
    * calendar-bounded (months², not orders²), the scale posture that
    * makes the estimator free at any fact volume. Slopes divide exact
    * 2dp-decimal revenue differences by integer month gaps (identical
    * doubles cross-engine); the median is the exact interpolated
    * percentile, surfaced 4dp (the established recipe). */
  def revenueTheilSen(s: SparkSession, dir: String): DataFrame = {
    val monthly = monthlyRevenue(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = monthly.select(col("n_name"), col("x").as("xi"), col("rev").as("ri"))
    val b = monthly.select(col("n_name"), col("x").as("xj"), col("rev").as("rj"))
    val slopes = a.join(b, Seq("n_name")).filter(col("xi") < col("xj"))
      .withColumn("slope",
        (col("rj") - col("ri")).cast("double") /
          (col("xj") - col("xi")).cast("double"))
    val nm = monthly.groupBy(col("n_name")).agg(count(lit(1)).as("n_months"))
    slopes.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5D)").as("m"))
      .join(nm, Seq("n_name"))
      .select(col("n_name"), col("n_months"), col("n_pairs"),
        round(col("m"), 4).as("theil_slope"))
      .orderBy(col("n_name"))
  }

  /** Monthly revenue per nation (x = months since 1995-01, rev = exact
    * 2dp-decimal sum) — shared by the OLS and Theil–Sen trend rows. */
  private[ops] def monthlyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .join(broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("x",
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .cast("long"))
      .groupBy(col("n_name"), col("x"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))

  /** Two-sample experiment readout (A/B test): users hash into
    * variant A or B by the same md5-bucket recipe the leak-free
    * train/val/test splitter uses (assignment is a function of the
    * unit, not the traffic), then Welch's z compares mean event value:
    * z = (m_A − m_B) / √(v_A/n_A + v_B/n_B). Moments are exact
    * decimal sums per variant; means/variances/z are one fixed IEEE
    * expression over them — the experiment readout is bit-identical
    * on any engine and partitioning. One scan, one two-group
    * aggregate; at 100 TB the same plan reads per-variant partial
    * aggregates only. */
  def abTestValue(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("user_id"),
        round(col("value"), 6).cast("decimal(18,6)").as("v"))
      .withColumn("variant",
        when(substring(md5(col("user_id").cast("string")), 1, 2) < "80",
          lit("A")).otherwise(lit("B")))
    val m = e.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("s2"))
      .select(col("variant"), col("n"), col("n").cast("double").as("nd"),
        col("s").cast("double").as("sd"), col("s2").cast("double").as("s2d"))
      .withColumn("mean", col("sd") / col("nd"))
      .withColumn("variance",
        (col("s2d") - col("sd") * col("sd") / col("nd")) / (col("nd") - lit(1.0d)))
    val a = m.filter(col("variant") === "A")
      .select(col("n").as("n_a"), col("mean").as("mean_a"), col("variance").as("var_a"),
        col("nd").as("nd_a"))
    val b = m.filter(col("variant") === "B")
      .select(col("n").as("n_b"), col("mean").as("mean_b"), col("variance").as("var_b"),
        col("nd").as("nd_b"))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"), round(col("mean_b"), 6).as("mean_b"),
        round((col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("nd_a") + col("var_b") / col("nd_b")), 4).as("z"))
  }

  /** Churn report: users active in the OBSERVATION window (first 3
    * weeks) split by whether they return in the HOLDOUT week (the
    * last 7 days of the span) — the weekly-retention question every
    * product pipeline answers. Window boundaries derive from the data
    * (max day − 7), counts are exact, the churn rate one division.
    * Anti-join shape: observation actives minus holdout actives. */
  def churnedUsers(s: SparkSession, dir: String): DataFrame = {
    val e = EventQueries.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cut = e.agg(date_add(max(col("day")), -7).as("cut"))
    val marked = e.crossJoin(broadcast(cut))
    val obs = marked.filter(col("day") <= col("cut"))
      .select(col("user_id")).distinct()
    val hold = marked.filter(col("day") > col("cut"))
      .select(col("user_id")).distinct()
    val churned = obs.join(hold, Seq("user_id"), "left_anti")
    val retained = obs.join(hold, Seq("user_id"), "left_semi")
    churned.select(col("user_id"), lit("churned").as("status"))
      .unionAll(retained.select(col("user_id"), lit("retained").as("status")))
      .orderBy(col("user_id"))
  }

  /** Kaplan–Meier survival curve over order-to-ship delays, with the
    * CENSORING a naive histogram of ship − order gets wrong: the
    * observation window closes at the latest ORDER date, so an item
    * whose ship date falls beyond the window tells us its delay
    * EXCEEDS what we observed, not what it was — and TPC-H ship lags
    * run to ~120 days, so the tail of the order book is heavily
    * censored. KM is the estimator built for exactly that: each item
    * contributes an observed duration (its ship lag if shipped inside
    * the window, window-end − order date otherwise) and an event
    * flag; at each shipped-delay t, n_risk = items whose observed
    * duration ≥ t, d = ships at t, and S(t) = Π (1 − d/n_risk) — the
    * probability an ordered item is STILL UNSHIPPED after t days. One
    * row per shipped-delay day.
    *
    * Data honesty: THIS testdata's ship and order dates are drawn
    * independently, so observed delays span negative values — the
    * estimator is indifferent (the time axis is ordinal; risk sets
    * and the product telescope identically), and the textbook
    * semantics are pinned on hand-computed durations in StatsSpec.
    * On real TPC-H-shaped data delays are the 1..121-day ship lag.
    *
    * Determinism: counts are exact integers; the survival product is
    * a SEQUENTIAL fold with a 9dp shortest-repr round per step, which
    * no distributed aggregate expresses — so, exactly like the PCA
    * power solver, the distributed plan reduces the corpus to the
    * bounded delay-day frame (≤ one row per distinct delay day — the
    * calendar-frame contract) and the fold runs driver-side,
    * mirrored step for step by the oracle's recursive CTE. Survival
    * values sit far above the scale-28 staging floor
    * ([[graft.OracleSql.roundDecSub]]).
    *
    * Scale posture: one scan-stage projection, one bounded-frame
    * aggregate + running window, a ≤ span-days collect. Nothing else
    * touches the driver. */
  def deliverySurvivalCurve(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      .join(Tables(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          to_date(col("o_orderdate")).as("odate")), "l_orderkey")
    val wend = li.agg(max(col("odate")).as("wend"))
    val lab = li.crossJoin(broadcast(wend))
      .select(
        when(col("ship") <= col("wend"), datediff(col("ship"), col("odate")))
          .otherwise(datediff(col("wend"), col("odate")))
          .cast("long").as("dur"),
        (col("ship") <= col("wend")).as("dead"))
    survivalFromDurations(s, lab)
  }

  /** KM machinery over a (dur: long, dead: boolean) frame — shared by
    * the driver row and any other time-to-event surface. */
  private[ops] def survivalFromDurations(s: SparkSession,
                                         lab: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = lab.agg(count(lit(1)).as("n_total"))
    val frame = lab.groupBy(col("dur").as("delay_days"))
      .agg(sum(when(col("dead"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leaving"))
    // deliberate unpartitioned running window: the frame is
    // day-cardinality-bounded BY CONSTRUCTION (one row per distinct
    // delay day), never corpus-sized — the calendar-frame contract
    val w = Window.orderBy(col("delay_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val deathDays = frame
      .withColumn("left_before", coalesce(sum(col("leaving")).over(w), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("delay_days"), col("d"),
        (col("n_total") - col("left_before")).as("n_risk"))
      .filter(col("d") > 0)
      .orderBy(col("delay_days"))
      .collect()
    var sPrev = 1.0d
    val out = deathDays.map { r =>
      val (day, d, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // the oracle's roundDecSub twin: shortest repr, HALF_UP at 9dp
      val s9 = BigDecimal.decimal(sPrev * (1.0 - d.toDouble / n.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      sPrev = s9.toDouble
      (day, n, d, s9.toDouble)
    }.toSeq
    import s.implicits._
    out.toDF("delay_days", "n_risk", "n_shipped", "survival")
      .orderBy(col("delay_days"))
  }

  /** Winsorized per-type value stats — the robust-mean counterpart of
    * [[Insights.valueOutliers]]' z-scores: clamp `value` into its
    * exact interpolated [p05, p95] (bounds rounded at 4dp FIRST —
    * the cross-engine-proven percentile form, see the
    * `value_percentiles` row), then mean and population stddev of the
    * clamped series from exact decimal moments (6dp DECIMAL staging
    * before the sums, one fixed IEEE expression after — the module
    * recipe). Winsorization is the standard heavy-tail taming before
    * averaging a quality/latency metric.
    *
    * Scale posture: one percentile aggregate per type (the exact
    * interpolated percentile sorts within groups; the
    * `approx_value_percentiles` row documents the sketch-based 100 TB
    * substitute), bounds broadcast back, one moment aggregate —
    * two passes over events, nothing driver-side. */
  def valueWinsorized(s: SparkSession, dir: String): DataFrame = {
    val ev = EventQueries.events(s, dir)
      .select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.05D)"), 4).as("lo"),
        round(expr("percentile(value, 0.95D)"), 4).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("wv",
        round(least(greatest(col("value"), col("lo")), col("hi")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("lo")).as("lo"),
        max(col("hi")).as("hi"), sum(col("wv")).as("sw"),
        sum(col("wv") * col("wv")).as("sw2"))
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        col("n").cast("double").as("nd"),
        col("sw").cast("double").as("swd"), col("sw2").cast("double").as("sw2d"))
      .select(col("event_type"), col("n"), col("lo"), col("hi"),
        round(col("swd") / col("nd"), 4).as("win_mean"),
        round(sqrt(greatest(
          (col("sw2d") - col("swd") * col("swd") / col("nd")) / col("nd"),
          lit(0.0d))), 4).as("win_std"))
      .orderBy(col("event_type"))
  }

  private def corrSql(name: String, sx: String, sy: String, sxx: String,
                      syy: String, sxy: String): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val n = "CAST(n AS DOUBLE)"
    val num = s"$n * ${d(sxy)} - ${d(sx)} * ${d(sy)}"
    val den = s"sqrt(($n * ${d(sxx)} - ${d(sx)} * ${d(sx)}) * ($n * ${d(syy)} - ${d(sy)} * ${d(sy)}))"
    s"SELECT '$name' AS pair, n, ${OracleSql.round(s"($num) / ($den)", 6)} AS r FROM m"
  }

  val defs: Map[String, QueryDef] = Map(
    "numeric_correlations" -> QueryDef(numericCorrelations, Some(
      s"""WITH li AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS q,
         |    CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
         |    CAST(l_discount AS DECIMAL(12,2)) AS d FROM lineitem),
         |m AS (SELECT count(*) AS n, sum(q) AS sq, sum(p) AS sp, sum(d) AS sd,
         |    sum(q*q) AS sqq, sum(p*p) AS spp, sum(d*d) AS sdd,
         |    sum(q*p) AS sqp, sum(q*d) AS sqd, sum(p*d) AS spd FROM li)
         |${corrSql("quantity_extendedprice", "sq", "sp", "sqq", "spp", "sqp")}
         |UNION ALL ${corrSql("quantity_discount", "sq", "sd", "sqq", "sdd", "sqd")}
         |UNION ALL ${corrSql("extendedprice_discount", "sp", "sd", "spp", "sdd", "spd")}
         |ORDER BY pair""".stripMargin)),
    "ab_test_value" -> QueryDef(abTestValue, Some {
      def d(c: String) = s"CAST($c AS DOUBLE)"
      s"""WITH e AS (SELECT
         |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
         |         THEN 'A' ELSE 'B' END AS variant,
         |    CAST(${OracleSql.round("value", 6)} AS DECIMAL(18,6)) AS v
         |  FROM events),
         |m AS (SELECT variant, count(*) AS n, sum(v) AS s, sum(v * v) AS s2
         |      FROM e GROUP BY variant),
         |w AS (SELECT variant, n, ${d("n")} AS nd, ${d("s")} AS sd, ${d("s2")} AS s2d FROM m),
         |x AS (SELECT variant, n, nd, sd / nd AS mean,
         |        (s2d - sd * sd / nd) / (nd - 1.0) AS variance FROM w)
         |SELECT a.n AS n_a, b.n AS n_b,
         |  ${OracleSql.round("a.mean", 6)} AS mean_a,
         |  ${OracleSql.round("b.mean", 6)} AS mean_b,
         |  ${OracleSql.round("(a.mean - b.mean) / sqrt(a.variance / a.nd + b.variance / b.nd)", 4)} AS z
         |FROM (SELECT * FROM x WHERE variant = 'A') a,
         |     (SELECT * FROM x WHERE variant = 'B') b""".stripMargin
    }),
    // The survival product is mirrored by a sequential recursive CTE
    // (row rn+1 folds row rn's value) — same step arithmetic as the
    // driver-side fold: CAST(prev AS DOUBLE) * (1 − d/n), scale-28
    // staged 9dp round (roundDecSub).
    "shipping_survival" -> QueryDef(deliverySurvivalCurve, Some {
      val step = OracleSql.roundDecSub(
        "CAST(k.s AS DOUBLE) * (1.0 - CAST(x.d AS DOUBLE) / CAST(x.n_risk AS DOUBLE))", 9)
      val base = OracleSql.roundDecSub(
        "1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)", 9)
      s"""WITH RECURSIVE li AS (SELECT CAST(l_shipdate AS DATE) AS ship,
         |              CAST(o_orderdate AS DATE) AS odate
         |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |w AS (SELECT max(odate) AS wend FROM li),
         |lab AS (SELECT CASE WHEN ship <= (SELECT wend FROM w)
         |                    THEN CAST(ship - odate AS BIGINT)
         |                    ELSE CAST((SELECT wend FROM w) - odate AS BIGINT) END AS dur,
         |               ship <= (SELECT wend FROM w) AS dead FROM li),
         |tot AS (SELECT count(*) AS n_total FROM lab),
         |df AS (SELECT dur AS delay_days,
         |         CAST(count(*) FILTER (WHERE dead) AS BIGINT) AS d,
         |         count(*) AS leaving
         |       FROM lab GROUP BY 1),
         |days AS (SELECT delay_days, d,
         |    CAST((SELECT n_total FROM tot) - coalesce(sum(leaving) OVER
         |      (ORDER BY delay_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS n_risk
         |  FROM df),
         |dd AS (SELECT delay_days, d, n_risk,
         |         row_number() OVER (ORDER BY delay_days) AS rn
         |       FROM days WHERE d > 0),
         |km AS (
         |  SELECT rn, delay_days, d, n_risk, $base AS s FROM dd WHERE rn = 1
         |  UNION ALL
         |  SELECT x.rn, x.delay_days, x.d, x.n_risk, $step AS s
         |  FROM dd x JOIN km k ON x.rn = k.rn + 1)
         |SELECT delay_days, n_risk, d AS n_shipped, CAST(s AS DOUBLE) AS survival
         |FROM km ORDER BY delay_days""".stripMargin
    }),
    "churned_users" -> QueryDef(churnedUsers, Some(
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cut AS (SELECT max(day) - 7 AS cut FROM e),
        |obs AS (SELECT DISTINCT user_id FROM e, cut WHERE day <= cut),
        |hold AS (SELECT DISTINCT user_id FROM e, cut WHERE day > cut)
        |SELECT user_id, 'churned' AS status FROM obs
        |WHERE user_id NOT IN (SELECT user_id FROM hold)
        |UNION ALL
        |SELECT user_id, 'retained' FROM obs
        |WHERE user_id IN (SELECT user_id FROM hold)
        |ORDER BY user_id""".stripMargin)),
    "revenue_trend_slopes" -> QueryDef(revenueTrendSlopes, Some {
      def d(c: String) = s"CAST($c AS DOUBLE)"
      val n = "CAST(n AS DOUBLE)"
      val slope = s"(($n * ${d("sxy")} - ${d("sx")} * ${d("sy")}) / ($n * ${d("sxx")} - ${d("sx")} * ${d("sx")}))"
      s"""WITH monthly AS (
         |  SELECT n_name,
         |    CAST((date_part('year', o_orderdate) - 1995) * 12
         |         + date_part('month', o_orderdate) - 1 AS BIGINT) AS x,
         |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name, x),
         |m AS (SELECT n_name, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
         |    sum(rev) AS sy, sum(rev * x) AS sxy
         |  FROM monthly GROUP BY n_name HAVING count(*) >= 2)
         |SELECT n_name, n AS n_months,
         |  ${OracleSql.round(slope, 4)} AS slope,
         |  ${OracleSql.round(s"((${d("sy")} - $slope * ${d("sx")}) / $n)", 4)} AS intercept
         |FROM m ORDER BY n_name""".stripMargin
    }),
    "value_winsorized" -> QueryDef(valueWinsorized, Some(
      s"""WITH b AS (SELECT event_type,
         |    ${OracleSql.round("quantile_cont(value, 0.05)", 4)} AS lo,
         |    ${OracleSql.round("quantile_cont(value, 0.95)", 4)} AS hi
         |  FROM events GROUP BY event_type),
         |w AS (SELECT e.event_type, b.lo, b.hi,
         |    CAST(${OracleSql.round("least(greatest(value, lo), hi)", 6)}
         |         AS DECIMAL(18,6)) AS wv
         |  FROM events e JOIN b ON e.event_type = b.event_type),
         |m AS (SELECT event_type, count(*) AS n, max(lo) AS lo, max(hi) AS hi,
         |    sum(wv) AS sw, sum(wv * wv) AS sw2
         |  FROM w GROUP BY event_type),
         |d AS (SELECT event_type, n, lo, hi, CAST(n AS DOUBLE) AS nd,
         |    CAST(sw AS DOUBLE) AS swd, CAST(sw2 AS DOUBLE) AS sw2d FROM m)
         |SELECT event_type, n, lo, hi,
         |  ${OracleSql.round("swd / nd", 4)} AS win_mean,
         |  ${OracleSql.round("sqrt(greatest((sw2d - swd * swd / nd) / nd, 0.0))", 4)} AS win_std
         |FROM d ORDER BY event_type""".stripMargin)),
    "revenue_theilsen" -> QueryDef(revenueTheilSen, Some(
      s"""WITH monthly AS (
         |  SELECT n_name,
         |    CAST((date_part('year', o_orderdate) - 1995) * 12
         |         + date_part('month', o_orderdate) - 1 AS BIGINT) AS x,
         |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name, x),
         |sl AS (SELECT a.n_name,
         |    CAST(b.rev - a.rev AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
         |  FROM monthly a JOIN monthly b ON a.n_name = b.n_name AND a.x < b.x),
         |nm AS (SELECT n_name, count(*) AS n_months FROM monthly GROUP BY n_name)
         |SELECT s.n_name, nm.n_months, count(*) AS n_pairs,
         |  ${OracleSql.round("quantile_cont(slope, 0.5)", 4)} AS theil_slope
         |FROM sl s JOIN nm ON s.n_name = nm.n_name
         |GROUP BY s.n_name, nm.n_months ORDER BY s.n_name""".stripMargin)))
}
