package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-moment statistics on planted data with known closed forms:
  * perfectly linear columns give |r| = 1 and the planted slope. */
class StatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("correlations: planted linear and anti-linear pairs give r = ±1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stats").toString
    // p = 2q + 3 (r = +1), d = 0.5 - 0.01q (r = -1; steps exactly
    // representable at the DECIMAL(12,2) money scale — a finer step
    // would be rounded by the cast and break exact linearity)
    (1 to 20).map(i => (i.toDouble, 2.0 * i + 3, 0.5 - i * 0.01))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Stats.numericCorrelations(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got("quantity_extendedprice") == 1.0, s"$got")
    assert(got("quantity_discount") == -1.0, s"$got")
    assert(got("extendedprice_discount") == -1.0, s"$got")
  }

  test("trend slopes: planted linear monthly revenue recovers slope and intercept") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stats").toString
    // nation A: revenue = 100*x + 500 over 6 months (one order per
    // month); nation B: single month -> excluded by n >= 2
    val orders =
      (0 until 6).map(i => (i.toLong, 1L, f"1995-${i + 1}%02d-15", 100.0 * i + 500)) :+
        (10L, 2L, "1995-01-20", 42.0)
    orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 0L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, "ALPHA"), (1L, "BETA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = Stats.revenueTrendSlopes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("ALPHA", 6L, 100.0, 500.0)), s"${got.toSeq}")
  }

  test("A/B readout: hash-assigned variants, Welch z from exact moments") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("stats").toString
    val rows = (1 to 40).map(i =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong, "click", i * 1.5, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // replicate the assignment + moments in scalar code
    def variant(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (f"${h(0) & 0xff}%02x" < "80") "A" else "B"
    }
    val byV = (1 to 40).groupBy(i => variant(i.toLong))
      .view.mapValues(_.map(i => i * 1.5)).toMap
    def mv(xs: Seq[Double]): (Double, Double) = {
      val n = xs.size.toDouble
      val s = xs.sum; val s2 = xs.map(x => x * x).sum
      (s / n, (s2 - s * s / n) / (n - 1.0))
    }
    val (ma, va) = mv(byV("A").map(_.toDouble))
    val (mb, vb) = mv(byV("B").map(_.toDouble))
    val zExp = BigDecimal.decimal((ma - mb) /
        math.sqrt(va / byV("A").size + vb / byV("B").size))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Stats.abTestValue(spark, dir).head()
    assert(got.getLong(0) == byV("A").size && got.getLong(1) == byV("B").size)
    assert(got.getDouble(4) == zExp, s"z ${got.getDouble(4)} != $zExp")
  }

  test("churn: holdout-week absence marks churned; holdout-only users excluded") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("stats").toString
    Seq(
      (1L, "2024-01-01 10:00:00", 1L), // obs only -> churned
      (2L, "2024-01-01 11:00:00", 2L), // obs...
      (3L, "2024-01-29 09:00:00", 2L), // ...and holdout -> retained
      (4L, "2024-01-28 09:00:00", 3L)) // holdout only -> not reported
      .map { case (e, ts, u) => (e, Timestamp.valueOf(ts), u, "click", 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Stats.churnedUsers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "churned"), (2L, "retained")), s"${got.toSeq}")
  }

  test("SCD2 point-in-time join: each order sees the version valid on its date") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stats").toString
    Seq((7L, "C7", 20.0)).toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 7L, "1995-06-01", 10.0), // old version
        (2L, 7L, "1997-01-01", 10.0), // new version
        (3L, 7L, "1996-01-01", 10.0)) // boundary day -> NEW (valid_from inclusive)
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TpchQueries.ordersScd2Enrich(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 20.0, "1995-01-01"),
      (2L, 120.0, "1996-01-01"),
      (3L, 120.0, "1996-01-01")), s"${got.toSeq}")
    // structural invariant: validity intervals partition the timeline,
    // so enrichment is row-preserving
    assert(TpchQueries.ordersScd2Enrich(spark, dir).count() ==
      spark.read.parquet(s"$dir/orders.parquet").count())
  }

  test("SCD2: changed keys version with closed validity; others stay current") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stats").toString
    Seq((6L, "C6", 10.0), (7L, "C7", 20.0), (14L, "C14", 30.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = TpchQueries.customerDimScd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (6L, 10.0, "1995-01-01", None, true),
      (7L, 20.0, "1995-01-01", Some("1996-01-01"), false),
      (7L, 120.0, "1996-01-01", None, true),
      (14L, 30.0, "1995-01-01", Some("1996-01-01"), false),
      (14L, 130.0, "1996-01-01", None, true)), s"${got.toSeq}")
  }

  test("Theil-Sen matches a scalar pairwise-median reference and shrugs off outliers") {
    val dir = "/root/testdata/sf0.001"
    val monthly = Stats.monthlyRevenue(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue()))
      .groupBy(_._1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * 0.5
      val lo = s(idx.toInt)
      val hi = s(math.ceil(idx).toInt)
      lo + (hi - lo) * (idx - idx.toInt)
    }
    val ref = monthly.map { case (nation, rows) =>
      val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)
      nation -> BigDecimal.decimal(median(slopes))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Stats.revenueTheilSen(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((nation, want) <- ref)
      assert(got(nation) == want, s"$nation: got ${got(nation)}, want $want")
    // robustness on a constructed line: 20 points of y = 5x + 3 with
    // the HIGH-LEVERAGE endpoint corrupted by +1000. Only 19 of 190
    // pairwise slopes touch the
    // corruption, so the MEDIAN is still an uncorrupted slope —
    // exactly 5 — while OLS shifts visibly (the estimator's point).
    def theil(p: Seq[(Long, Double)]): Double = median(
      (for { i <- p.indices; j <- (i + 1) until p.length }
        yield (p(j)._2 - p(i)._2) / (p(j)._1 - p(i)._1)))
    def ols(p: Seq[(Long, Double)]): Double = {
      val n = p.length.toDouble
      val sx = p.map(_._1.toDouble).sum; val sy = p.map(_._2).sum
      val sxx = p.map(q => q._1.toDouble * q._1).sum
      val sxy = p.map(q => q._1 * q._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val line = (0L until 20L).map(x => (x, 5.0 * x + 3))
    val corrupted = line.updated(19, (19L, 5.0 * 19 + 3 + 1000))
    assert(theil(line) == 5.0 && theil(corrupted) == 5.0,
      "the pairwise-slope median must ignore a single corrupted point")
    assert(math.abs(ols(corrupted) - 5.0) > 1.0,
      s"OLS should shift visibly: ${ols(corrupted)}")
  }

  test("winsorized stats: one planted outlier clamps to p95; clean mean recovered") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stats").toString
    // values 1..20 plus one 1000 outlier: with n = 21 the exact
    // interpolated p05 lands on sorted[0.05·20] = sorted[1] = 2 and
    // p95 on sorted[19] = 20, so winsorizing maps 1→2 and 1000→20;
    // the winsorized mean is (2 + Σ2..20 + 20)/21 = 231/21 = 11
    val values = (1 to 20).map(_.toDouble) :+ 1000.0
    values.zipWithIndex
      .map { case (v, i) => (i.toLong, s"2024-01-01 00:0${i % 10}:00", i.toLong, "buy", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Stats.valueWinsorized(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "buy" && r.getLong(1) == 21L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 20.0, s"bounds: $r")
    assert(r.getDouble(4) == 11.0, s"win_mean: $r")
    // population std of the clamped series, same fixed expression
    val clamped = values.map(v => math.min(math.max(v, 2.0), 20.0))
    val n = clamped.length.toDouble
    val (s1, s2) = (clamped.sum, clamped.map(v => v * v).sum)
    val wantStd = BigDecimal.decimal(math.sqrt((s2 - s1 * s1 / n) / n))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == wantStd, s"win_std: $r want $wantStd")
  }

  test("Kaplan-Meier: textbook curve on hand-computed durations with censoring") {
    import spark.implicits._
    // events at t=10 (x2) and t=20; censored at 15, 50, 100.
    // t=10: risk 6, d 2 -> S = round9(1 - 2/6)            = 0.666666667
    // t=20: risk 3 (two deaths + one censor left), d 1 ->
    //       S = round9(0.666666667 * (1 - 1/3))           = 0.444444445
    // the censored-at-15 row shrinks the t=20 risk set WITHOUT a
    // death row - the property a plain histogram cannot express
    val lab = Seq((10L, true), (10L, true), (15L, false),
      (20L, true), (50L, false), (100L, false)).toDF("dur", "dead")
    val got = Stats.survivalFromDurations(spark, lab).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((10L, 6L, 2L, 0.666666667), (20L, 3L, 1L, 0.444444445)),
      s"${got.toSeq}")
  }

  test("Kaplan-Meier: no censoring degenerates to the exact empirical tail") {
    import spark.implicits._
    val lab = Seq((1L, true), (2L, true), (2L, true), (3L, true))
      .toDF("dur", "dead")
    val got = Stats.survivalFromDurations(spark, lab).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // S(t) = fraction with dur > t when nothing is censored
    assert(got.toSeq == Seq((1L, 0.75), (2L, 0.25), (3L, 0.0)), s"${got.toSeq}")
  }
}
