package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order interleave semantics, the clustering property it buys
  * (bounded spans in BOTH dimensions), and the partition-pruning pin
  * for the date-partitioned events layout. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("zInterleave matches hand-computed bit interleaving") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3) with 3 bits:
    // z = x2 y2 x1 y1 x0 y0 = 1 0 0 1 1 1 = 0b100111 = 39
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zInterleave(col("x"), col("y"), 3).as("z"))
      .collect()(0).getLong(0)
    assert(got == 39L)
    // identity checks: interleave(x, 0) spreads x onto odd bits
    val odd = Seq((7L, 0L)).toDF("x", "y")
      .select(Layout.zInterleave(col("x"), col("y"), 3).as("z"))
      .collect()(0).getLong(0)
    assert(odd == 42L) // 0b101010
  }

  test("z-order bins bound the span of BOTH dims; a linear sort does not") {
    // 64x64 uniform grid. With 16 equal-width z-bins each bin must
    // cover a sub-rectangle: span fraction ~1/4 per dim (2 z-bits cut
    // x once and y once... exactly: 16 bins = 4 top z-bits = 2 bits
    // per dim -> span 1/4 of the range in each dim). A sort by x alone
    // would leave y's span at the FULL range in every bin.
    import spark.implicits._
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("x8", expr("(x * 256) DIV 64"))
      .withColumn("y8", expr("(y * 256) DIV 64"))
      .withColumn("bin", shiftright(Layout.zInterleave(col("x8"), col("y8"), 8), 12))
      .groupBy("bin")
      .agg(countDistinct(col("x")).as("nx"),
        (max(col("x")) - min(col("x"))).as("xspan"),
        (max(col("y")) - min(col("y"))).as("yspan"))
      .collect()
    assert(df.length == 16)
    df.foreach { r =>
      assert(r.getLong(2) <= 15, s"x span too wide: $r")
      assert(r.getLong(3) <= 15, s"y span too wide: $r")
    }
  }

  test("partitioned events read prunes to the target day's partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("layout").toString
    val rows = (0 until 40).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 10 + 1}%02d 12:00:00"),
        (i % 3).toLong, "click", 1.5, "")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Layout.partitionedEventsPrune(spark, dir)
    val plan = out.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*day""".r.findFirstIn(plan).isDefined,
      s"no day partition pruning in plan:\n$plan")
    // fixture spans days 1..10, so min+14 is absent -> empty result is
    // correct AND the pruned scan must not error on a missing partition
    assert(out.collect().isEmpty)
    // a present day aggregates only that day's rows: re-run against a
    // wider fixture whose min+14 exists
    val rows2 = (0 until 60).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${i % 20 + 1}%02d 12:00:00"),
        (i % 3).toLong, if (i % 2 == 0) "click" else "view", 2.0, "")
    }
    rows2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Layout.partitionedEventsPrune(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // day 15 (i % 20 == 14): i in {14, 34, 54} -> all even+odd mix:
    // 14 click, 34 click, 54 click (even) -> 3 clicks? i=14 even click,
    // i=34 even click, i=54 even click. All three land on click.
    assert(got.toSeq == Seq(("click", 3L, 6.0)))
  }

  test("skip simulation: pruning invariants and the multi-dim layout win") {
    val dir = "/root/testdata/sf0.001"
    val got = Layout.layoutSkipSimulation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val matching = got.values.head._3
    for ((name, (bins, rows, m)) <- got) {
      assert(m == matching, "matching_rows must be layout-independent")
      assert(rows >= m, s"$name claims to read fewer rows than match")
      assert(bins <= 32, s"$name reads more bins than exist")
    }
    // structural: a linear sort's bin is the top-5 bits of its leading
    // dim, and the rect covers exactly 4 of those values
    assert(got("linear_cust")._1 <= 4 && got("linear_day")._1 <= 4)
    // the decision the row exists to make: on a two-dim predicate the
    // space-filling curves read fewer rows than either linear sort
    assert(got("hilbert")._2 < got("linear_cust")._2 &&
      got("hilbert")._2 < got("linear_day")._2,
      s"hilbert did not beat the linear sorts: $got")
    assert(got("zorder")._2 < got("linear_cust")._2, s"$got")
  }

  test("bloom skipping: no false negatives, and absent mid-domain keys prune") {
    import spark.implicits._
    // gappy key domain (even keys only) so absent probes land
    // MID-DOMAIN — the case the dense driver table cannot exhibit
    val dir = java.nio.file.Files.createTempDirectory("bloomskip").toString
    (0 until 64).map(i => (i.toLong * 2, i.toLong % 16,
        java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i))))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = Layout.bloomSkipSimulation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 8, s"${rows.toSeq}")
    val (present, absent) = rows.partition(_._2)
    assert(present.length == 4 && absent.length == 4)
    for ((k, _, zone, bloom, truth) <- present) {
      assert(truth >= 1 && bloom >= truth,
        s"false negative at $k: bloom=$bloom true=$truth")
      assert(bloom <= zone, s"bloom must never read more than zones at $k")
    }
    // every absent probe except possibly max+1 is mid-domain: zone
    // maps read bins, the bloom reads only false positives
    for ((k, _, zone, bloom, truth) <- absent) {
      assert(truth == 0, s"$k marked absent but found")
      assert(bloom <= zone, s"$k: bloom=$bloom zone=$zone")
    }
    assert(absent.exists(_._3 > 0), "no mid-domain absent probe exercised zones")
    spark.catalog.clearCache()
  }

  test("hilbert index: base-case quadrant order at bits=1") {
    import spark.implicits._
    val got = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.spatialFunctions.hilbert_index(col("x"), col("y"), 1).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L), s"$got")
  }

  test("hilbert index: bijective AND curve-adjacent at bits=3 (z-order is not)") {
    import spark.implicits._
    val cells = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)).toDF("x", "y")
    val d2xy = cells
      .select(graft.functions.spatialFunctions.hilbert_index(col("x"), col("y"), 3).as("d"),
        col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bijection onto [0, 64)
    assert(d2xy.keySet == (0L until 64L).toSet)
    // THE Hilbert property — consecutive curve positions are grid
    // neighbors (|dx| + |dy| = 1). The Z interleave fails this at
    // every power-of-two seam; holding it proves real curve structure.
    for (d <- 0L until 63L) {
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }
}
