package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range joins against brute-force reference computations,
  * plus plan-shape pins for the scale claims (the driver oracle covers
  * the DuckDB cross-check; these cover the semantics and plans). */
class JoinOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asofForward matches per-row brute force incl. no-match nulls") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "ms", "click_id")
    val purchases = Seq((1L, 10L, 200L), (1L, 20L, 201L))
      .toDF("user_id", "ms", "purchase_id")
    val got = AsofJoin.asofForward(clicks, purchases, "user_id", "ms")
      .orderBy("click_id").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // click@10 matches same-instant purchase@10; click@25 has nothing
    // following; user 2 has no purchases at all
    assert(got.toSeq == Seq((100L, 200L), (101L, -1L), (102L, -1L)))
  }

  test("range join matches brute-force band counts at sf0.001") {
    val e = EventQueries.events(spark, dir)
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = 3600000L
    val expected = e.filter(_._2 == "purchase").map { case (aid, _, ams) =>
      aid -> e.count { case (id, _, ms) => id != aid && math.abs(ms - ams) <= w }
    }.filter(_._2 > 0).toMap
    val got = RangeJoin.nearbyEventCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.map { case (k, v) => k -> v.toLong })
  }

  test("range join plans as an equi-join on bins, not a nested loop") {
    val plan = RangeJoin.nearbyEventCounts(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop plan:\n$plan")
  }

  test("funnel: monotone non-increasing, anchored at distinct signup users, window monotone") {
    val counts = EventQueries.funnelConversion(spark, dir).collect()
      .sortBy(_.getInt(0)).map(_.getLong(2))
    assert(counts.length == 4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${counts.toSeq}")
    val signups = EventQueries.serviceCount(spark, dir).collect()
      .collectFirst { case r if r.getString(0) == "signup" => () }
    assert(signups.isDefined)
    val distinctSignup = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(counts.head == distinctSignup)
    // a wider window can only convert MORE users at every step
    val wide = EventQueries.funnelConversion(spark, dir, windowMs = Long.MaxValue / 4)
      .collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(counts.zip(wide).forall { case (n, w) => w >= n },
      s"narrow window beat wide: ${counts.toSeq} vs ${wide.toSeq}")
  }

  test("session_window gap boundary: exactly-gap MERGES (inclusive window end)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{session_window => sw}
    val gapUs = 10L * 1000 * 1000 // 10s sessions for the fixture
    val df = Seq((1L, 0L), (1L, gapUs), // exactly the gap apart
        (2L, 0L), (2L, gapUs - 1),      // just inside
        (3L, 0L), (3L, gapUs + 1))      // just outside
      .toDF("uid", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val n = df.groupBy(sw(col("ts"), "10 seconds"), col("uid"))
      .count().collect().map(r => r.getLong(1) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.length).toMap
    // > gap ⇒ split (only uid 3); ≤ gap ⇒ merge — the engine's window
    // end (last event + gap) is INCLUSIVE, pinned here because the
    // oracle CTE must replicate the boundary exactly
    assert(n == Map(1L -> 1, 2L -> 1, 3L -> 2),
      s"session_window boundary semantics changed: $n")
  }

  test("native session_window agrees with the hand-rolled eventSessions") {
    val native = EventQueries.sessionWindowStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val hand = EventQueries.eventSessions(spark, dir).collect()
    // eventSessions: (user_id, session_idx, start_ms, end_ms, n_events, ...)
    val cols = EventQueries.eventSessions(spark, dir).columns.toSeq
    val iu = cols.indexOf("user_id"); val is = cols.indexOf("start_ms")
    val ie = cols.indexOf("end_ms"); val in = cols.indexOf("n_events")
    assert(Seq(iu, is, ie, in).forall(_ >= 0), s"columns: $cols")
    val handSet = hand.map(r =>
      (r.getLong(iu), r.getLong(is), r.getLong(ie), r.getLong(in))).toSet
    assert(native == handSet,
      s"native=${native.size} hand=${handSet.size}; diff=${(native -- handSet).take(3)}")
  }

  test("approx percentiles track the exact ones at two scale factors") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val exact = EventQueries.valuePercentiles(spark, d).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val approx = EventQueries.approxValuePercentiles(spark, d).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(approx.keySet == exact.keySet)
      for ((k, (a25, a50, a75)) <- approx; (e25, e50, e75) = exact(k)) {
        // accuracy 10000 ⇒ rank error ≤ n/10000 ≈ a hair of the value
        // range on this near-uniform data; 2% relative is generous
        def close(a: Double, e: Double) = math.abs(a - e) <= math.max(0.02 * e, 0.5)
        assert(close(a25, e25) && close(a50, e50) && close(a75, e75),
          s"$d/$k approx ($a25,$a50,$a75) vs exact ($e25,$e50,$e75)")
      }
    }
  }

  test("incremental user stats equal the one-shot aggregate (split-invariance)") {
    // the driver row splits by event_id % 4; recompute the same
    // answer directly and require exact equality INCLUDING the float
    // sum (9dp-decimal per-value rounding makes it order-independent)
    val inc = EventQueries.userStatsIncremental(spark, dir).collect()
    val full = {
      val ev = EventQueries.events(spark, dir)
        .withColumn("ms", unix_millis(col("ts")))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ms")).as("first_ms"),
          max(col("ms")).as("last_ms"),
          sum(round(col("value"), 9).cast("decimal(20,9)")).cast("double").as("sum_value"))
        .orderBy(col("user_id")).collect()
    }
    assert(inc.toSeq == full.toSeq)
  }

  test("incremental merge: state-only and batch-only users survive the outer fold") {
    import spark.implicits._
    // the real events table never produces one-sided users (everyone
    // has ids in both residue classes), so the full-outer NULL
    // branches — coalesce counts, least/greatest over NULL — are
    // exercised HERE: user 100 exists only in the batch (ids % 4 == 0),
    // user 200 only in history, user 300 in both
    val rows = Seq(
      (4L, "2024-01-01 10:00:00", 100L, Some(10.0)),
      (8L, "2024-01-02 10:00:00", 100L, Some(5.0)),
      (1L, "2024-01-03 10:00:00", 200L, Some(7.0)),
      (2L, "2024-01-04 10:00:00", 300L, Some(1.0)),
      (12L, "2024-01-05 10:00:00", 300L, Some(2.0)),
      // user 400: every value NULL, split across both sides — the
      // merged sum must stay NULL (a full recompute sums to NULL),
      // not coalesce to 0.0
      (16L, "2024-01-06 10:00:00", 400L, None: Option[Double]),
      (3L, "2024-01-07 10:00:00", 400L, None: Option[Double]))
      .toDF("event_id", "ts", "user_id", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val d = "target/scratch/inc_onesided"
    rows.write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventQueries.userStatsIncremental(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got == Map(100L -> ((2L, Some(15.0))), 200L -> ((1L, Some(7.0))),
      300L -> ((2L, Some(3.0))), 400L -> ((2L, None))), s"$got")
  }

  test("quartile assignment: boundary value lands in the lower bucket (<=)") {
    import spark.implicits._
    // 8 values; p25 of (1..8) = 2.75, p50 = 4.5, p75 = 6.25 — plant a
    // value exactly AT a rounded threshold to pin <= semantics
    val v = Seq.tabulate(8)(i => ("t", (i + 1).toDouble)) :+ (("t", 2.75))
    val df = v.toDF("event_type", "value")
    val th = df.groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D))").as("p"))
      .select(round(element_at(col("p"), 1), 4).as("p25")).head.getDouble(0)
    val buckets = df
      .withColumn("b", when(col("value") <= lit(th), 1).otherwise(2))
      .filter(col("value") === 2.75).select("b").collect().map(_.getInt(0))
    // 2.75 is the 25th percentile of 1..8; with the planted extra row
    // the threshold shifts but stays >= 2.75, so <= keeps it in b=1
    assert(buckets.forall(_ == 1), s"boundary row escaped: ${buckets.toSeq}")
  }

  test("user EWMA equals the scalar sequential fold (order pinned by ms, event_id)") {
    val got = EventQueries.userValueEwma(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ev = EventQueries.events(spark, dir)
      .withColumn("ms", unix_millis(col("ts")))
      .select("user_id", "ms", "event_id", "value")
      .filter(col("value").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def round9(x: Double): Double =
      BigDecimal.decimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = ev.groupBy(_._1).view.mapValues { rows =>
      rows.sortBy(t => (t._2, t._3)).map(_._4)
        .foldLeft(0.0)((acc, v) => round9(0.2 * v + 0.8 * acc))
    }.toMap
    assert(got.keySet == want.keySet)
    for ((u, w) <- want) assert(got(u) == w, s"user $u: ${got(u)} vs $w")
  }

  test("trailing hour value: range frame equals brute-force recompute") {
    val rows = EventQueries.trailingHourValue(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    import org.apache.spark.sql.functions.{col => c, unix_millis}
    val vals = EventQueries.events(spark, dir)
      .select(c("user_id"), c("event_id"), unix_millis(c("ts")).as("ms"), c("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUserVals = vals.groupBy(_._1)
    for ((u, rs) <- byUser; (_, id, ms, got) <- rs.take(200)) {
      val want = byUserVals(u)
        .filter(v => v._3 >= ms - 3600000 && v._3 <= ms)
        .map(v => BigDecimal.decimal(v._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(math.abs(got - want) < 1e-9, s"user $u event $id: $got != $want")
    }
  }

  test("daily error rate: trailing-7 is a CALENDAR frame, recomputed directly") {
    val rows = EventQueries.dailyErrorRate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    def ordinal(day: String): Long = java.time.LocalDate.parse(day).toEpochDay
    for ((day, _, _, _, t7) <- rows) {
      val o = ordinal(day)
      val frame = rows.filter(r => { val x = ordinal(r._1); x >= o - 6 && x <= o })
      val want = BigDecimal.decimal(
          frame.map(_._3).sum.toDouble / frame.map(_._2).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(t7 == want, s"day $day: $t7 != $want")
    }
    // day one's trailing average IS its rate
    assert(rows.head._4 == rows.head._5)
  }

  test("cohort retention: offsets non-negative, day-0 row per cohort, user-day conservation") {
    val rows = EventQueries.cohortRetention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative offset")
    val byCohort = rows.groupBy(_._1)
    // every cohort's day-0 row exists and is its maximum (everyone is
    // active on their own first day)
    for ((c, rs) <- byCohort) {
      val day0 = rs.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $c missing day-0")
      assert(rs.forall(_._3 <= day0.get._3), s"cohort $c day-0 not maximal")
    }
    // sum of day-0 counts = total distinct users
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
  }
}
