package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile: clean testdata has zero nulls, distinct counts consistent") {
    val rows = DataQuality.profileEvents(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(rows.values.forall(_._1 == 0L), s"unexpected nulls: $rows")
    val n = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows("event_id")._2 == n, "event_id must be unique")
    assert(rows("event_type")._2 == 5L)
  }

  test("checks: planted violations produce exact violation counts") {
    import spark.implicits._
    val events = Seq((1L, 10L, 1L, "click", 1.0, "{}"),
        (1L, 11L, 1L, "click", -2.0, "{}"), // dup id + negative value
        (2L, 12L, 2L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val customer = Seq((1L, "a")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 7L), (12L, 8L)) // 2 dangling FKs
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 5.0), (10L, 0.0), (10L, -1.0)) // 2 non-positive
      .toDF("l_orderkey", "l_quantity")
    val documents = Seq((0L, "text"), (1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = DataQuality.checksOn(events, orders, customer, lineitem, documents)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("event_id_unique") == ((1L, false)))
    assert(got("orders_custkey_fk") == ((2L, false)))
    assert(got("lineitem_quantity_positive") == ((2L, false)))
    assert(got("events_value_nonnegative") == ((1L, false)))
    assert(got("docs_text_nonempty") == ((2L, false)))
  }

  test("chi-square: exactly 0 under perfect independence, n under perfect 2x2 association") {
    import spark.implicits._
    // perfectly proportional: every (lang, source) cell = 5 → chi2 = 0
    val indep = (for (l <- Seq("a", "b"); s0 <- Seq("x", "y"); _ <- 1 to 5)
      yield (l, s0)).toDF("lang", "source")
    val r1 = DataQuality.chiSquareOn(indep, "lang", "source").head()
    assert(r1.getLong(0) == 4 && r1.getLong(1) == 1 && r1.getDouble(2) == 0.0)
    // perfect diagonal association in 2×2: chi2 = n
    val dep = ((1 to 10).map(_ => ("a", "x")) ++ (1 to 10).map(_ => ("b", "y")))
      .toDF("lang", "source")
    val r2 = DataQuality.chiSquareOn(dep, "lang", "source").head()
    assert(r2.getLong(0) == 4 && r2.getDouble(2) == 20.0, s"${r2.getDouble(2)}")
  }

  test("value histogram: bins partition each type's count, bounds respected") {
    val rows = EventQueries.valueHistogram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = EventQueries.serviceCount(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == want, "histogram bins must partition each type's events")
  }

  test("join-key skew profile: counts reconcile and shares are consistent") {
    val got = DataQuality.joinKeySkew(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == 3)
    got.foreach { case (c, nRows, nKeys, maxCnt, top10, share) =>
      assert(nKeys > 0 && nRows >= nKeys, s"$c")
      assert(maxCnt <= top10 && top10 <= nRows, s"$c")
      assert(share > 0 && share <= 1.0, s"$c")
      // a <=10-key column concentrates ALL rows in its top-10
      if (nKeys <= 10) assert(top10 == nRows, s"$c")
    }
    // documents.source has a handful of sources -> full concentration
    val src = got.find(_._1 == "documents.source").get
    assert(src._6 == 1.0 || src._3 > 10, s"$src")
  }

  test("checks: the driver testdata passes every check") {
    val got = DataQuality.checks(spark, dir).collect()
      .map(r => (r.getString(0), r.getBoolean(2)))
    assert(got.length == 5 && got.forall(_._2), s"failing checks: ${got.toSeq}")
  }
}
