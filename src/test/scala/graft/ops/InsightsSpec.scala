package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture semantics for the behavioral-analytics family:
  * transition counts with a deterministic (ts, event_id) tie-break,
  * exact trailing-7-day distinct reach, and z-scores derived from
  * exact decimal moments. */
class InsightsSpec extends AnyFunSuite {

  test("anomaly days: gate agrees with a scala recomputation of the MAD z over seasonal residuals") {
    val sfDir = "/root/testdata/sf0.001"
    val seas = Insights.dailyValueSeasonal(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val got = Insights.dailyAnomalyDays(spark, sfDir).collect()
    assert(got.length == seas.size, "one row per day, same day frame")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val res = seas.values.toSeq
    val med = BigDecimal(median(res)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mad = BigDecimal(median(res.map(r => math.abs(r - med))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { r =>
      val (day, residual, anomaly) = (r.getString(0), r.getDouble(2), r.getBoolean(4))
      assert(residual == seas(day), s"residual drifted from the seasonal row at $day")
      if (mad > 0) {
        val rz = BigDecimal((residual - med) * 0.6745 / mad)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(3) == rz, s"$day: surfaced rz ${r.getDouble(3)} != $rz")
        assert(anomaly == (math.abs(rz) > 3.5), s"$day: rz=$rz anomaly=$anomaly")
      } else assert(!anomaly)
    }
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write an events.parquet fixture and return its directory. */
  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("insights").toString
    rows.map { case (id, ts, u, t, v) => (id, Timestamp.valueOf(ts), u, t, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("transition matrix counts consecutive pairs per user, tie-broken on event_id") {
    // user 1: click -> view -> click; user 2: two events at the SAME ts,
    // ordered by event_id (10 before 11): view -> error
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "click", 1.0),
      (2L, "2024-01-01 00:00:02", 1L, "view", 1.0),
      (3L, "2024-01-01 00:00:03", 1L, "click", 1.0),
      (10L, "2024-01-02 00:00:00", 2L, "view", 1.0),
      (11L, "2024-01-02 00:00:00", 2L, "error", 1.0)))
    val got = Insights.eventTransitionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "error", 1L, 0.5)))
  }

  test("rolling distinct users counts the trailing 7 days, active days only") {
    // user 1 active on day 1 and day 10; user 2 on day 3.
    // Day 3's trailing week covers days 1 and 3 -> users {1, 2} = 2.
    // Day 10 is beyond day 3's +6 horizon -> only user 1.
    val dir = eventsDir(Seq(
      (1L, "2024-03-01 12:00:00", 1L, "click", 1.0),
      (2L, "2024-03-03 12:00:00", 2L, "click", 1.0),
      (3L, "2024-03-10 12:00:00", 1L, "click", 1.0)))
    val got = Insights.rollingDistinctUsers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 1L), ("2024-03-03", 2L), ("2024-03-10", 1L)))
  }

  test("gapfill: missing days appear with zero actuals and carried-forward value") {
    val dir = eventsDir(Seq(
      (1L, "2024-02-01 10:00:00", 1L, "click", 7.5),
      (2L, "2024-02-01 11:00:00", 1L, "click", 2.5),
      (3L, "2024-02-03 09:00:00", 1L, "click", 4.0)))
    val got = Insights.userValueGapfill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "2024-02-01", 2L, 10.0, 10.0),
      (1L, "2024-02-02", 0L, 0.0, 10.0), // gap: zero actual, carried 10
      (1L, "2024-02-03", 1L, 4.0, 4.0)), s"${got.toSeq}")
  }

  test("hourly profile: per-type shares reflect hour counts exactly") {
    // type a: 3 events at hour 1, 1 at hour 5; type b: 2 at hour 0
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 01:00:00", 1L, "a", 1.0),
      (2L, "2024-01-01 01:10:00", 2L, "a", 1.0),
      (3L, "2024-01-02 01:20:00", 3L, "a", 1.0),
      (4L, "2024-01-01 05:00:00", 1L, "a", 1.0),
      (5L, "2024-01-01 00:30:00", 1L, "b", 1.0),
      (6L, "2024-01-01 00:40:00", 2L, "b", 1.0)))
    val got = Insights.hourlyActivityProfile(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", 1L, 3L, 0.75), ("a", 5L, 1L, 0.25), ("b", 0L, 2L, 1.0)),
      s"${got.toSeq}")
  }

  test("changepoint: a planted mean shift is found at the exact shift day") {
    // value 10 on days 1-4 (2 events/day), 30 on days 5-8: best split
    // after day 4 — mean_before 10, mean_after 30, delta 20
    val rows = for {
      d <- 1 to 8; i <- 0 to 1
    } yield (((d * 10) + i).toLong, f"2024-05-0$d%d 0$i%d:00:00", 1L, "click",
      if (d <= 4) 10.0 else 30.0)
    val dir = eventsDir(rows)
    val got = Insights.dailyValueChangepoint(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("2024-05-04", 10.0, 30.0, 20.0)), s"${got.toSeq}")
  }

  test("segmentation recovers a planted 3-regime staircase; flat segments never split") {
    // 18 days, one event/day: value 10 (days 1-6), 30 (7-12), 50
    // (13-18). Level 1 ties split-at-6 vs split-at-12 at delta 30 —
    // the day tie-break picks 06; level 2 splits [7,18] at 12; every
    // remaining segment is FLAT (delta 0) and must survive unchanged,
    // so depth 3 still yields exactly the three regimes.
    val rows = (1 to 18).map { d =>
      (d.toLong, f"2024-05-$d%02d 00:00:00", 1L, "click",
        if (d <= 6) 10.0 else if (d <= 12) 30.0 else 50.0)
    }
    val dir = eventsDir(rows)
    val got = Insights.dailyValueSegments(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2024-05-01", "2024-05-06", 6L, 6L, 10.0),
      ("2024-05-07", "2024-05-12", 6L, 6L, 30.0),
      ("2024-05-13", "2024-05-18", 6L, 6L, 50.0)), s"${got.toSeq}")
    // a series shorter than 2*minLen days has no legal split at all
    val tiny = eventsDir((1 to 5).map(d =>
      (d.toLong, f"2024-05-0$d%d 00:00:00", 1L, "click", d * 10.0)))
    val one = Insights.dailyValueSegments(spark, tiny).collect()
    assert(one.length == 1 && one(0).getLong(2) == 5L, one.toSeq.toString)
  }

  test("session paths: trigrams never cross a session boundary") {
    // one user, two sessions 7h apart: [a b c d] and [x y z].
    // trigrams: abc, bcd, xyz — never "cdx"/"dxy" spanning the gap
    val types = Seq("a", "b", "c", "d")
    val s1 = types.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, f"2024-01-01 01:0$i%d:00", 1L, t, 1.0) }
    val s2 = Seq("x", "y", "z").zipWithIndex.map { case (t, i) =>
      ((i + 10).toLong, f"2024-01-01 09:0$i%d:00", 1L, t, 1.0) }
    val dir = eventsDir(s1 ++ s2)
    val got = Insights.sessionPathTopk(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSet == Set(("a", "b", "c", 1L), ("b", "c", "d", 1L),
      ("x", "y", "z", 1L)), s"${got.toSeq}")
  }

  test("TWAP weights each observation by its holding duration") {
    // user 1: 10.0 held 60s, then 20.0 held 180s, then a final obs
    // (no duration, drops out): twap = (10*60 + 20*180)/240 = 17.5
    // user 2: single event -> no durations -> excluded
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 10.0),
      (2L, "2024-01-01 00:01:00", 1L, "click", 20.0),
      (3L, "2024-01-01 00:04:00", 1L, "click", 99.0),
      (9L, "2024-01-01 00:00:00", 2L, "click", 5.0)))
    val got = Insights.userTimeWeightedValue(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 240000L, 17.5)), s"${got.toSeq}")
  }

  test("insights operators are empty-events-safe") {
    val dir = eventsDir(Seq.empty)
    assert(Insights.eventTransitionMatrix(spark, dir).count() == 0L)
    assert(Insights.rollingDistinctUsers(spark, dir).count() == 0L)
    assert(Insights.valueOutliers(spark, dir).count() == 0L)
    assert(Insights.userValueGapfill(spark, dir).count() == 0L)
  }

  test("value outliers flag |z| >= 2 from exact decimal moments") {
    // user 1: nine 10.0s and one 40.0. mean = 13, var = (s2 - s^2/n)/(n-1)
    //   s = 130, s2 = 9*100 + 1600 = 2500; var = (2500 - 1690)/9 = 90
    //   std = sqrt(90); z(40) = 27/sqrt(90) ≈ 2.8460 -> flagged
    //   z(10) = -3/sqrt(90) ≈ -0.3162 -> not flagged
    // user 2: constant values -> zero variance -> excluded entirely
    val base = (1 to 9).map(i =>
      (i.toLong, f"2024-01-01 00:00:$i%02d", 1L, "click", 10.0))
    val dir = eventsDir(base ++ Seq(
      (10L, "2024-01-01 00:01:00", 1L, "click", 40.0),
      (20L, "2024-01-01 00:02:00", 2L, "click", 5.0),
      (21L, "2024-01-01 00:02:01", 2L, "click", 5.0)))
    val got = Insights.valueOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val expZ = BigDecimal.decimal(27.0 / math.sqrt(90.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((10L, 1L, 40.0, expZ)))
  }

  test("seasonal decomposition: a pure weekly pattern leaves zero residuals") {
    // one event per day for 3 weeks starting Mon 2024-01-01; Mondays
    // value 10, all other days 1 → seasonal means absorb everything
    // (residual 0), and every full 7-day window sums to 16 → trend7
    // = 16/7 wherever the window is complete
    val rows = (0 until 21).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      val v = if (day.getDayOfWeek == java.time.DayOfWeek.MONDAY) 10.0 else 1.0
      (i.toLong, s"$day 12:00:00", 1L, "click", v)
    }
    val dir = eventsDir(rows)
    val got = Insights.dailyValueSeasonal(spark, dir).collect()
    assert(got.length == 21)
    got.foreach { r =>
      assert(r.getDouble(4) == 0.0, s"residual must vanish: $r")
    }
    val expTrend = BigDecimal.decimal(16.0 / 7.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { r =>
      val day = java.time.LocalDate.parse(r.getString(0))
      val edge = day.isBefore(java.time.LocalDate.of(2024, 1, 4)) ||
        day.isAfter(java.time.LocalDate.of(2024, 1, 18))
      if (edge) assert(r.isNullAt(5), s"partial window must emit no trend: $r")
      else assert(r.getDouble(5) == expTrend, s"trend: $r")
    }
  }

  test("MAD outliers: robust z flags the gross value, zero MAD disables") {
    // "click": values 1..9 plus 1000 → median 5.5, deviations sorted
    //   0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 → MAD 2.5;
    //   rz(1000) = 0.6745*994.5/2.5 ≈ 268.3 flagged, rz(1) ≈ 1.21 not.
    //   Note the 1000 barely moves the median/MAD — the robustness the
    //   mean/std row lacks (the same row shifts ITS mean by ~100).
    // "buy": two identical values → MAD 0 → scoring disabled.
    val click = (1 to 9).map(i =>
      (i.toLong, f"2024-01-01 00:00:$i%02d", 1L, "click", i.toDouble))
    val dir = eventsDir(click ++ Seq(
      (10L, "2024-01-01 00:01:00", 2L, "click", 1000.0),
      (20L, "2024-01-01 00:02:00", 3L, "buy", 5.0),
      (21L, "2024-01-01 00:02:01", 3L, "buy", 5.0)))
    val got = Insights.valueMadOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    val expMax = BigDecimal.decimal(994.5 * 0.6745 / 2.5)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      ("buy", 2L, 5.0, 0.0, 0L, 0.0),
      ("click", 10L, 5.5, 2.5, 1L, expMax)), s"${got.toSeq}")
  }
}
