package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture edges for the TPC-H classic shapes (Q14/Q15/Q17/
  * Q18/Q21): exact-threshold boundaries, max ties, and the Q21 double
  * correlation — the cases a green full-table oracle row can't
  * isolate. Fixtures are tiny parquet tables in a scratch dir shaped
  * like the testdata layout, so the spec drives the REAL driver-row
  * functions. */
class TpchClassicsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "target/scratch/tpch_classics"

  private lazy val fixture: String = {
    import spark.implicits._
    val li = Seq(
      // (orderkey, partkey, suppkey, qty, extprice, discount, shipdate, returnflag)
      // Q17 boundary part 10: qtys (1,3): qsum=4, cnt=2 → 2*1*2=4 == 4 strict-excluded
      (1L, 10L, 1L, 1.0, 100.0, 0.0, "1995-01-10", "N"),
      (1L, 10L, 1L, 3.0, 100.0, 0.0, "1995-01-11", "N"),
      // Q17 part 11: qtys (1,6): 2*1*2=4 < 7 → included
      (2L, 11L, 2L, 1.0, 50.0, 0.0, "1995-02-10", "N"),
      (2L, 11L, 2L, 6.0, 50.0, 0.0, "1995-02-11", "N"),
      // Q18: order 3 sums to exactly 300 (excluded), order 4 to 301
      (3L, 12L, 1L, 300.0, 10.0, 0.0, "1995-03-01", "N"),
      (4L, 12L, 1L, 200.0, 10.0, 0.0, "1995-03-02", "N"),
      (4L, 12L, 2L, 101.0, 10.0, 0.0, "1995-03-03", "N"),
      // Q21: order 5 multi-supplier, only supplier 1 returned → culprit
      (5L, 13L, 1L, 1.0, 10.0, 0.0, "1995-04-01", "R"),
      (5L, 13L, 2L, 1.0, 10.0, 0.0, "1995-04-02", "N"),
      // order 6 single-supplier R → not multi, excluded
      (6L, 13L, 3L, 1.0, 10.0, 0.0, "1995-04-03", "R"),
      // order 7 multi-supplier, TWO R suppliers → not solo, excluded
      (7L, 13L, 1L, 1.0, 10.0, 0.0, "1995-04-04", "R"),
      (7L, 13L, 2L, 1.0, 10.0, 0.0, "1995-04-05", "R"),
      // Q20 boundary part 14: supp1 share exactly 3/20 = 0.15 (strict
      // > excludes it), supp2 at 0.85 dominates
      (8L, 14L, 1L, 3.0, 10.0, 0.0, "1995-05-01", "N"),
      (8L, 14L, 2L, 17.0, 10.0, 0.0, "1995-05-02", "N"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val part = Seq(
      (10L, "PROMO POLISHED", "Brand#1"),
      (11L, "STANDARD BRUSHED", "Brand#2"),
      (12L, "PROMO ANODIZED", "Brand#3"),
      (13L, "ECONOMY PLATED", "Brand#4"))
      .toDF("p_partkey", "p_type", "p_brand")
    val orders = Seq(
      (3L, 100L, "1995-03-01"), (4L, 100L, "1995-03-02"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val customer = Seq((100L, "Customer#100"))
      .toDF("c_custkey", "c_name")
    val supplier = Seq(
      // suppliers 4 and 5 tie on revenue via identical single lines below
      (1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    customer.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    supplier.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    dir
  }

  test("revenue share: ranks ordered, shares in (0,1], revenue non-increasing") {
    val rows = TpchQueries.customerRevenueShare(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (nation, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq, nation)
      val revs = byRank.map(_._3)
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, nation)
      assert(rs.forall(r => r._4 > 0 && r._4 <= 1.0), nation)
      assert(rs.map(_._4).sum <= 1.0 + 1e-6, nation)
    }
  }

  test("Q20 shape: dominance threshold is strict at the exact 15% boundary") {
    val got = TpchQueries.excessSupplierParts(spark, fixture)
      .filter("l_partkey = 14").collect()
      .map(r => (r.getLong(1), r.getDouble(5)))
    // supp1's exactly-15% share must NOT appear; supp2's 85% must
    assert(got.toSeq == Seq((2L, 0.85)), s"got ${got.toSeq}")
  }

  test("Q17 shape: exact cross-multiplied threshold is strict") {
    val got = TpchQueries.smallQuantityRevenue(spark, fixture)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // part 10's qty=1 line sits exactly AT the half-average → excluded
    assert(!got.contains("Brand#1"), s"boundary row leaked: $got")
    // part 11's qty=1 line is strictly below → included, exactly once
    assert(got("Brand#2") == 1L, s"$got")
  }

  test("Q18 shape: sum==300 is excluded, 301 included") {
    val got = TpchQueries.largeVolumeCustomers(spark, fixture)
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(4L), s"expected only order 4: $got")
  }

  test("Q21 shape: sole-R supplier in multi-supplier orders only") {
    val got = TpchQueries.returnedItemSuppliers(spark, fixture)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 1L), s"double correlation broken: $got")
  }

  test("Q15 shape: revenue ties emit every argmax supplier") {
    val got = TpchQueries.topSupplierRevenue(spark, fixture)
      .collect().map(_.getLong(0)).toSeq
    // suppliers 1 and 2 both total 70.00 from orders 5+7 + their Q17/Q18
    // lines; compute the true argmax set brute-force instead of pinning
    val li = spark.read.parquet(s"$fixture/lineitem.parquet")
    val rev = li.groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(12,2)"))).as("r"))
    val mx = rev.agg(max("r")).head.getDecimal(0)
    val want = rev.filter(col("r") === mx).select("l_suppkey")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"got $got want $want")
  }

  test("upsert: matched updates, unmatched keeps, inserts; NULL patches keep old value") {
    import spark.implicits._
    val cur = Seq((1L, Some("a")), (2L, Some("b"))).toDF("k", "v")
    val upd = Seq((2L, None: Option[String]), (3L, Some("c"))).toDF("k", "v")
    val got = TpchQueries.upsert(cur, upd, "k").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getString(2)))).toMap
    assert(got == Map(
      1L -> ((Some("a"), "keep")),
      // presence flag says update even though the value field is NULL;
      // patch semantics keep the existing value
      2L -> ((Some("b"), "update")),
      3L -> ((Some("c"), "insert"))), s"$got")
  }

  test("Q14 shape: promo-free month reports 0 ratio, not NULL") {
    val got = TpchQueries.promoRevenueRatio(spark, fixture)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3))).toList
    val feb = got.find(_._1 == "1995-02").get
    assert(feb._2 == 0.0 && feb._3 == 0.0, s"Feb should be promo-free: $feb")
    val mar = got.find(_._1 == "1995-03").get
    assert(mar._3 == 100.0, s"Mar is all-promo: $mar")
  }

  // The round-5-continuation shapes (Q4/Q7/Q19/Q22 adaptations) are
  // recomputed independently against the real smallest-scale testdata
  // — inner-join+distinct vs semi-join, per-bracket sums vs the
  // disjunction, direct threshold/anti-join recounts.

  private val real = "/root/testdata/sf0.001"

  test("Q4 shape: EXISTS counts an order once regardless of late-line multiplicity") {
    val got = TpchQueries.lateShipmentOrders(spark, real)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val o = spark.read.parquet(s"$real/orders.parquet")
    val l = spark.read.parquet(s"$real/lineitem.parquet")
    val want = o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want && got.values.sum > 0, s"$got vs $want")
  }

  test("Q19 shape: the disjunction partitions into its three brand-disjoint brackets") {
    // sf0.01, not sf0.001: the smallest scale has no rows in any
    // bracket, which would vacuously pass the partition equality
    val real = "/root/testdata/sf0.01"
    val row = TpchQueries.quantityBandRevenue(spark, real).collect()(0)
    val l = spark.read.parquet(s"$real/lineitem.parquet")
    val p = spark.read.parquet(s"$real/part.parquet")
    def bracket(brand: String, qLo: Int, qHi: Int, szHi: Int): Long =
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand &&
          col("l_quantity").between(qLo, qHi) && col("p_size").between(1, szHi))
        .count()
    val parts = bracket("Brand#12", 1, 11, 5) +
      bracket("Brand#23", 10, 20, 10) + bracket("Brand#34", 20, 30, 15)
    assert(row.getLong(1) == parts && parts > 0, s"${row.getLong(1)} vs $parts")
  }

  test("Q22 shape: reported customers exceed the threshold and lack recent orders") {
    val rows = TpchQueries.dormantCustomerBalance(spark, real).collect()
    val c = spark.read.parquet(s"$real/customer.parquet")
    val thr = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
        count(lit(1))).as("t")).collect()(0).getDouble(0)
    val recent = spark.read.parquet(s"$real/orders.parquet")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val want = c.filter(col("c_acctbal") > thr)
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getLong(1)).sum == want && want > 0,
      s"${rows.map(_.getLong(1)).sum} vs $want")
  }

  test("Q7 shape: pair rows cover exactly the cross-nation item set") {
    val rows = TpchQueries.nationPairTrade(spark, real).collect()
    val l = spark.read.parquet(s"$real/lineitem.parquet")
    val o = spark.read.parquet(s"$real/orders.parquet")
    val cu = spark.read.parquet(s"$real/customer.parquet")
    val su = spark.read.parquet(s"$real/supplier.parquet")
    val want = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .count()
    assert(rows.map(_.getLong(3)).sum == want && want > 0,
      s"${rows.map(_.getLong(3)).sum} vs $want")
  }
}
