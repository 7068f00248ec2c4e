package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage over the driver's TPC-H-ish star
  * schema: multi-way equi-joins, broadcast dims, semi/anti joins,
  * rollup, set operations, distinct aggregation, date/string scalar
  * functions, global top-N. The reference has no joins (SURVEY.md
  * §2.3) — this is the engine surface a user needs beyond it, each
  * query DuckDB-oracle-checked.
  *
  * Scale posture per query is noted inline; the common rules: dimension
  * tables (region/nation/customer/supplier/part at TPC-H proportions)
  * are broadcast — fact-table scans never shuffle for them; aggregates
  * reduce before joins where semantics allow; AQE handles skew/coalesce
  * at runtime.
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Money columns arrive as parquet doubles whose true values have two
    * decimals; casting to DECIMAL(12,2) before aggregation makes the
    * sums exact and ORDER-INDEPENDENT, so results cannot drift when a
    * plan change reorders the summation (a float sum did exactly that
    * when shippingPriority's join order changed: one of 2905 revenues
    * crossed a half-cent boundary against the oracle). Surfaced as
    * DOUBLE after rounding — an exact 2-decimal value converts to the
    * same double in every engine. Averages divide the exact decimal
    * sum (as double) by the count for the same reason. */
  private def money(c: Column): Column = c.cast("decimal(12,2)")

  /** TPC-H Q1 shape: pricing summary. One scan, one shuffle on a
    * 6-value group key; all arithmetic codegen'd into the scan stage.
    * (l_quantity holds small integers: its double sum is already exact
    * regardless of order, so it stays double.) */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        round(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
          * (lit(1) + money(col("l_tax")))), 2).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)), 2).as("avg_price"),
        round(sum(money(col("l_discount"))).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: revenue per order for one market segment.
    * Join order matters and Catalyst won't reorder it without CBO:
    * the broadcast customer-segment join prunes orders FIRST (~1/5 of
    * rows survive), so the expensive lineitem⋈orders shuffle join
    * moves a 5× smaller build side. */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(round(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("o_orderkey"))
  }

  /** TPC-H Q5 shape: revenue by region/nation where customer and
    * supplier share a nation. All dims broadcast; single fact shuffle. */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-semi join (EXISTS): customers that have placed an order. */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Global top-N: most expensive orders. TakeOrderedAndProject —
    * bounded heap per partition, no global sort. Ordering on the raw
    * parquet double (bit-identical across engines), rounded only in
    * the projection. */
  def topOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("total_price"))
      .limit(10)

  /** ROLLUP: customer counts by region ⟶ nation with subtotals. */
  def rollupCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(money(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** INTERSECT: nations having both customers and suppliers. */
  def nationsWithBoth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** EXCEPT: nations with customers but no suppliers. */
  def nationsCustomersOnly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  /** UNION ALL + conformed projection: one account-balance ledger over
    * two entity kinds. */
  def balanceLedger(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(lit("customer").as("kind"), col("c_custkey").as("entity_key"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .unionAll(t(s, dir, "supplier")
        .select(lit("supplier").as("kind"), col("s_suppkey").as("entity_key"),
          round(col("s_acctbal"), 2).as("acctbal")))
      .orderBy(col("kind"), col("entity_key"))

  /** Distinct aggregation: market-segment diversity per nation. */
  def nationSegmentDiversity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        countDistinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))

  /** Date bucketing: order volume per month. */
  def ordersByMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("month"))

  /** String scalar functions: brand stats with a derived prefix key. */
  def partBrandStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("type_prefix", upper(substring(col("p_type"), 1, 6)))
      .groupBy(col("p_brand"), col("type_prefix"))
      .agg(
        count(lit(1)).as("n_parts"),
        round(avg(col("p_retailprice")), 2).as("avg_price"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"))
      .orderBy(col("p_brand"), col("type_prefix"))

  /** Correlated-shape aggregation (TPC-H Q13 flavor): distribution of
    * order counts per customer, including zero-order customers via a
    * left outer join. */
  def orderCountDistribution(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  /** GROUPING SETS with disjoint sets (neither rollup nor cube):
    * order counts by status alone and by priority alone, one pass. */
  def orderGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  private def R(e: String, n: Int): String = graft.OracleSql.round(e, n)

  /** Exact-decimal discounted price sum (see [[money]]). */
  private val discPriceDec =
    "sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))"

  val defs: Map[String, QueryDef] = Map(
    "order_grouping_sets" -> QueryDef(orderGroupingSets, Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),
    "pricing_summary" -> QueryDef(pricingSummary, Some(
      s"""SELECT l_returnflag, l_linestatus,
        |  ${R("sum(l_quantity)", 2)} AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(round($discPriceDec, 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
        |  ${R("avg(l_quantity)", 2)} AS avg_qty,
        |  ${R("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)", 2)} AS avg_price,
        |  ${R("CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*)", 4)} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    "shipping_priority" -> QueryDef(shippingPriority, Some(
      s"""SELECT o_orderkey, o_orderpriority,
        |  CAST(round($discPriceDec, 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY o_orderkey""".stripMargin)),
    "region_revenue" -> QueryDef(regionRevenue, Some(
      s"""SELECT r_name, n_name,
        |  CAST(round($discPriceDec, 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin)),
    "customers_with_orders" -> QueryDef(customersWithOrders, Some(
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey")),
    "customers_without_orders" -> QueryDef(customersWithoutOrders, Some(
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey")),
    "top_orders" -> QueryDef(topOrders, Some(
      s"SELECT o_orderkey, o_custkey, ${R("o_totalprice", 2)} AS total_price FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),
    "rollup_customers" -> QueryDef(rollupCustomers, Some(
      s"""SELECT r_name, n_name, count(*) AS n_customers, CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)),
    "nations_with_both" -> QueryDef(nationsWithBoth, Some(
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey")),
    "nations_customers_only" -> QueryDef(nationsCustomersOnly, Some(
      "SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey")),
    "balance_ledger" -> QueryDef(balanceLedger, Some(
      s"""SELECT * FROM (
        |  SELECT 'customer' AS kind, c_custkey AS entity_key, ${R("c_acctbal", 2)} AS acctbal FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS kind, s_suppkey AS entity_key, ${R("s_acctbal", 2)} AS acctbal FROM supplier)
        |ORDER BY kind, entity_key""".stripMargin)),
    "nation_segment_diversity" -> QueryDef(nationSegmentDiversity, Some(
      "SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments, count(*) AS n_customers FROM customer GROUP BY c_nationkey ORDER BY c_nationkey")),
    "orders_by_month" -> QueryDef(ordersByMonth, Some(
      s"SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total FROM orders GROUP BY 1 ORDER BY month")),
    "part_brand_stats" -> QueryDef(partBrandStats, Some(
      s"""SELECT p_brand, upper(substr(p_type, 1, 6)) AS type_prefix,
        |  count(*) AS n_parts, ${R("avg(p_retailprice)", 2)} AS avg_price,
        |  min(p_size) AS min_size, max(p_size) AS max_size
        |FROM part GROUP BY 1, 2 ORDER BY p_brand, type_prefix""".stripMargin)),
    "order_count_distribution" -> QueryDef(orderCountDistribution, Some(
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin)))
}
