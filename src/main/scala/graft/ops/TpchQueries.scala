package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** TPC-H Q14 shape: promo revenue share per ship month. One fact
    * scan ⋈ broadcast(part); the conditional numerator and the total
    * are EXACT decimal sums, so the surfaced double ratio is a
    * deterministic function of two order-independent values (the
    * division itself is one IEEE op — identical in every engine). */
  def promoRevenueRatio(s: SparkSession, dir: String): DataFrame = {
    val disc = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .withColumn("month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("month"))
      .agg(
        sum(when(col("p_type").startsWith("PROMO"), disc).otherwise(lit(0).cast("decimal(12,2)")))
          .as("promo_dec"),
        sum(disc).as("total_dec"))
      .select(col("month"),
        round(col("promo_dec").cast("double"), 2).as("promo_revenue"),
        round(col("total_dec").cast("double"), 2).as("total_revenue"),
        round(lit(100) * col("promo_dec").cast("double") / col("total_dec").cast("double"), 4)
          .as("promo_pct"))
      .orderBy(col("month"))
  }

  /** TPC-H Q15 shape: the top supplier(s) by total revenue, selected
    * by a scalar-max subquery. Revenue is an exact decimal per
    * supplier, so the max-equality join cannot be split by float
    * noise; the 1-row max side is broadcast. One fact shuffle on
    * l_suppkey. */
  def topSupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx"))
    rev.join(broadcast(mx), col("rev_dec") === col("mx"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_dec").cast("double"), 2).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape: revenue from below-half-average-quantity line
    * items, per brand. The correlated `l_quantity < 0.5 * avg(...)
    * per part` predicate is decorrelated into an aggregate ⋈ fact
    * join on l_partkey — and the threshold compare is kept EXACT by
    * cross-multiplying integers (`2·qty·cnt < Σqty` over
    * DECIMAL/LONG) instead of comparing against a float average, so
    * no boundary row can flip between engines. */
  def smallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(money(col("l_quantity"))).as("qsum"), count(lit(1)).as("qcnt"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(money(col("l_quantity")) * lit(2) * col("qcnt") < col("qsum"))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(money(col("l_extendedprice"))).as("rev_dec"))
      .select(col("p_brand"), col("n_lines"),
        round(col("rev_dec").cast("double") / 7, 2).as("avg_weekly_revenue"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q18 shape: large-volume orders (Σqty > 300) with their
    * customers. The per-order aggregate reduces the fact table FIRST;
    * the surviving handful of big orders then joins broadcast dims.
    * l_quantity holds small integers, so its double sum is exact and
    * the >300 gate is order-independent. */
  def largeVolumeCustomers(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    t(s, dir, "orders")
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy(desc("sum_qty"), col("o_orderkey"))
  }

  /** TPC-H Q21 shape (double correlation): suppliers who were the
    * SOLE supplier with returned items ('R') in a multi-supplier
    * order. Both correlated subqueries decorrelate into per-order
    * aggregates joined semi-style on l_orderkey — three passes over
    * the same scan, no row-level correlated execution. */
  def returnedItemSuppliers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ret = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val multi = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"))
      .filter(col("nsupp") > 1).select(col("l_orderkey"))
    val solo = ret.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nret"))
      .filter(col("nret") === 1).select(col("l_orderkey"))
    ret.join(multi, Seq("l_orderkey"), "left_semi")
      .join(solo, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), col("s_suppkey"))
  }

  /** MERGE INTO (upsert) semantics as one full-outer join — the
    * lakehouse dimension-maintenance shape: matched keys take the
    * update, current-only keys keep their row, update-only keys
    * insert; `action` records which branch fired (via presence
    * flags, so NULL data values can't masquerade as absence). Value
    * semantics are PATCH-style: a NULL field in an update row keeps
    * the current field (spec-pinned) — strict SET-NULL callers pass
    * a sentinel. One shuffle on the merge key — or zero over
    * co-bucketed layouts ([[Bucketing]]). */
  def upsert(current: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(updates.columns.toSet == current.columns.toSet,
      s"upsert schemas differ: ${current.columns.toSeq} vs ${updates.columns.toSeq}")
    val valCols = current.columns.filter(_ != key).toSeq
    val cur = current.select((col(key) +: valCols.map(c => col(c).as(s"__c_$c"))) :+
      lit(1).as("__c_present"): _*)
    val upd = updates.select((col(key) +: valCols.map(c => col(c).as(s"__u_$c"))) :+
      lit(1).as("__u_present"): _*)
    cur.join(upd, Seq(key), "full_outer")
      .select((col(key) +:
        valCols.map(c => coalesce(col(s"__u_$c"), col(s"__c_$c")).as(c))) :+
        when(col("__u_present").isNotNull && col("__c_present").isNotNull, "update")
          .when(col("__u_present").isNotNull, "insert")
          .otherwise("keep").as("action"): _*)
  }

  /** Driver row: a deterministic update batch (every 5th customer's
    * balance +100) plus an insert batch merged into the customer
    * dimension. Insert keys shift by max(c_custkey) — derived from
    * the data, not a constant, so they can NEVER collide with a real
    * key at any scale factor (a fixed 10^7 shift would silently turn
    * inserts into bogus updates once keys reach it). */
  def customerDimUpsert(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val mx = cust.agg(max(col("c_custkey")).as("mxk"))
    val cur = cust.select(col("c_custkey"),
      money(col("c_acctbal")).cast("decimal(13,2)").as("acctbal"))
    val upd = cust.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"),
        (money(col("c_acctbal")) + 100).cast("decimal(13,2)").as("acctbal"))
      .unionAll(cust.filter(col("c_custkey") % 7 === 0)
        .crossJoin(broadcast(mx))
        .select((col("c_custkey") + col("mxk")).as("c_custkey"),
          lit(50).cast("decimal(13,2)").as("acctbal")))
    upsert(cur, upd, "c_custkey")
      .select(col("c_custkey"), col("acctbal").cast("double").as("acctbal"),
        col("action"))
      .orderBy(col("c_custkey"))
  }

  /** TPC-H Q6 shape: forecast-revenue-change — a pure filter +
    * single-row aggregate, the simplest plan that must STILL push
    * every predicate into the scan (PushedFilters carries the date
    * range; the decimal band compare keeps boundary rows
    * engine-exact). */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        money(col("l_discount")).between(lit(0.05).cast("decimal(12,2)"),
          lit(0.07).cast("decimal(12,2)")) &&
        col("l_quantity") < 24)
      // round the exact DECIMAL, then cast — the pricing_summary
      // pairing; cast-then-round would round a double that may no
      // longer carry the exact .xx50 midpoint at large sums
      .agg(sum(money(col("l_extendedprice")) * money(col("l_discount"))).as("r"))
      .select(round(col("r"), 2).cast("double").as("revenue"))

  /** Distribution-rank window functions over orders: percent_rank,
    * cume_dist, and quartile (ntile) of order value within each
    * status. The window orders by (totalprice, orderkey) so ties
    * cannot make ntile assignment engine-dependent; percent_rank and
    * cume_dist are single IEEE divisions of identical integer ranks.
    * One shuffle on the 3-value partition key — at scale the same
    * shape runs per finer key (day, segment) for balance. */
  def orderRankStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(percent_rank().over(w), 9).as("pr"),
        round(cume_dist().over(w), 9).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** TPC-H Q4 shape: per-priority count of orders with at least one
    * late-shipped item (shipdate > orderdate + 90 days) — an EXISTS
    * semi-join with a non-equi conjunct riding the orderkey equi-key.
    * The semi-join shuffles only (orderkey, shipdate) projections;
    * priorities reduce in one 5-key aggregate. */
  def lateShipmentOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q7 shape: trade volume between customer and supplier
    * nations (cross-nation only). Facts join once on their keys; all
    * four dimension hops (customer, supplier, nation ×2) broadcast,
    * so the only shuffles are the fact-fact join and the 600-key
    * final aggregate. Revenue is the exact decimal sum. */
  def nationPairTrade(s: SparkSession, dir: String): DataFrame = {
    val disc = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(sum(disc).as("rev_dec"), count(lit(1)).as("n_items"))
      .select(col("cust_nation"), col("supp_nation"),
        round(col("rev_dec").cast("double"), 2).as("revenue"), col("n_items"))
      .orderBy(col("cust_nation"), col("supp_nation"))
  }

  /** TPC-H Q19 shape: revenue under an OR-of-ANDs predicate over
    * three (brand, quantity band, size band) brackets — the
    * disjunctive-pushdown stress: the whole predicate evaluates in
    * the scan/join stage, never as a post-join filter cascade. */
  def quantityBandRevenue(s: SparkSession, dir: String): DataFrame = {
    val disc = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    def bracket(brand: String, qLo: Int, qHi: Int, szHi: Int): Column =
      col("p_brand") === brand &&
        col("l_quantity").between(qLo, qHi) && col("p_size").between(1, szHi)
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(bracket("Brand#12", 1, 11, 5) ||
        bracket("Brand#23", 10, 20, 10) ||
        bracket("Brand#34", 20, 30, 15))
      .agg(round(sum(disc).cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 shape: dormant wealth — customers above the average
    * positive balance with no RECENT order (none since 2000-01-01 —
    * the unscoped "never ordered" version is degenerate on this data:
    * nearly every customer has some order), per nation. The threshold
    * is a 1-row broadcast scalar (decimal-sum/count,
    * order-independent); the dormancy test is a shuffled anti-join on
    * custkey with the date predicate pushed into the orders scan
    * (orders cannot broadcast at scale); nation names broadcast at
    * the end. */
  def dormantCustomerBalance(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg((sum(money(col("c_acctbal"))).cast("double") / count(lit(1))).as("thr"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(money(col("c_acctbal"))).cast("double"), 2).as("total_balance"))
      .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name").as("nation"), col("n_customers"), col("total_balance"))
      .orderBy(col("nation"))
  }

  /** Percent-of-total window: each nation's top-5 customers by order
    * revenue with their SHARE of the nation total — the ranking +
    * share-of-parent readout every revenue dashboard leads with. The
    * per-customer revenue is one fact-sized aggregate; the nation
    * total is a window sum over the already-aggregated customer frame
    * (exact decimal, so the share divides two engine-identical
    * decimals); rank and the top-5 cut tie-break on custkey. */
  def customerRevenueShare(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(money(col("o_totalprice"))).as("rev"))
    val byNation = Window.partitionBy(col("n_name"))
    val ranked = rev
      .withColumn("nation_rev", sum(col("rev")).over(byNation))
      .withColumn("rnk", row_number().over(
        byNation.orderBy(desc("rev"), col("c_custkey"))))
      .filter(col("rnk") <= 5)
    ranked.select(col("n_name"), col("rnk").cast("long").as("rnk"),
        col("c_custkey"),
        round(col("rev"), 2).cast("double").as("revenue"),
        round(col("rev").cast("double") / col("nation_rev").cast("double"), 6)
          .as("share"))
      .orderBy(col("n_name"), col("rnk"))
  }

  /** SCD Type-2 apply: the history-keeping sibling of
    * [[customerDimUpsert]] (Type 1 overwrites; Type 2 closes the old
    * version and opens a new one). The update batch is synthesized
    * deterministically (every 7th customer gets +100 balance,
    * effective 1996-01-01) so the oracle can rebuild it; real
    * deployments feed a CDC batch through the same join.
    *
    * Shape: dim LEFT JOIN updates on the business key, then each
    * matched row EXPLODES into its closed-out old version plus the
    * open new version — one shuffle join (broadcast when the batch is
    * small, which CDC batches are), one narrow explode; history depth
    * never multiplies the join itself. */
  def customerDimScd2(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), money(col("c_acctbal")).as("bal"))
    val upd = dim.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), (col("bal") + 100).as("new_bal"))
    val versions = when(col("new_bal").isNotNull, array(
      struct(col("bal").as("b"), lit("1995-01-01").as("vf"),
        lit("1996-01-01").as("vt"), lit(false).as("cur")),
      struct(col("new_bal").as("b"), lit("1996-01-01").as("vf"),
        lit(null).cast("string").as("vt"), lit(true).as("cur"))))
      .otherwise(array(
        struct(col("bal").as("b"), lit("1995-01-01").as("vf"),
          lit(null).cast("string").as("vt"), lit(true).as("cur"))))
    dim.join(upd, Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), explode(versions).as("v"))
      .select(col("c_custkey"), col("c_name"),
        col("v.b").cast("double").as("acctbal"),
        col("v.vf").as("valid_from"), col("v.vt").as("valid_to"),
        col("v.cur").as("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Point-in-time (temporal) join — the fact-side consumer of
    * [[customerDimScd2]]'s history: each order joins the dimension
    * VERSION that was valid on its order date, so pre-1996 orders see
    * the original balance and later ones the updated version. The join
    * is equi on the business key with the validity interval as a
    * post-join filter — per-key version counts are tiny (≤2 here,
    * bounded by update frequency in production), so this is a normal
    * key join at scale, not a range join; AQE handles the rest.
    * Exactly-one-version-per-order is a structural invariant (validity
    * intervals partition the timeline), spec-pinned via a row-count
    * equality with plain orders. */
  def ordersScd2Enrich(s: SparkSession, dir: String): DataFrame = {
    val dim = customerDimScd2(s, dir)
      .select(col("c_custkey"), col("acctbal"), col("valid_from"), col("valid_to"))
    t(s, dir, "orders")
      .join(dim, col("o_custkey") === col("c_custkey") &&
        col("o_orderdate") >= col("valid_from").cast("timestamp") &&
        (col("valid_to").isNull ||
          col("o_orderdate") < col("valid_to").cast("timestamp")))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("total_price"),
        col("acctbal").as("acctbal_at_order"), col("valid_from"))
      .orderBy(col("o_orderkey"))
  }

  /** TPC-H Q20 shape: supplier-part pairs where one supplier shipped
    * more than 15% of a part's total quantity — the correlated
    * "compare a group's aggregate against its parent group's
    * aggregate" pattern. The parent total RE-AGGREGATES the child
    * frame instead of scanning the fact twice (one wide shuffle on
    * (suppkey, partkey); the per-part totals are derived from it and
    * re-joined on partkey). The dominance test is exact decimal
    * cross-multiplication — no 0.3*total double compare to drift at a
    * boundary. Supplier names broadcast in at the end. */
  def excessSupplierParts(s: SparkSession, dir: String): DataFrame = {
    val sp = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(money(col("l_quantity"))).as("sp_qty"))
    val totals = sp.groupBy(col("l_partkey"))
      .agg(sum(col("sp_qty")).as("part_qty"))
    sp.join(totals, Seq("l_partkey"))
      .filter(col("sp_qty") * 20 > col("part_qty") * 3)
      .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("sp_qty").cast("double").as("sp_qty"),
        col("part_qty").cast("double").as("part_qty"),
        round(col("sp_qty").cast("double") / col("part_qty").cast("double"), 4).as("share"))
      .orderBy(col("l_partkey"), col("l_suppkey"))
  }

  /** TPC-H Q10 shape: top customers by revenue lost to returned items
    * ('R') in one quarter. The fact join reduces to a per-customer
    * aggregate BEFORE the dimension joins (customer and nation
    * broadcast); the quarter predicate pushes into both scans. The
    * top-20 sorts on the rounded exact-decimal revenue (identical
    * double in every engine) with a custkey tie-break, so the LIMIT
    * boundary cannot flip between engines — planned as
    * TakeOrderedAndProject, no global sort. */
  def returnedItemCustomers(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .as("rev_dec"))
    rev.join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 2).as("acctbal"),
        round(col("rev_dec"), 2).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape: high- vs low-priority line counts per shipping
    * class over one ship year. This schema carries no l_shipmode /
    * l_commitdate / l_receiptdate, so l_linestatus plays the grouping
    * dimension and the ship-date year the window — the join +
    * conditional-count structure is Q12's. One fact shuffle on a
    * 2-value key after a pushed date filter; the priority test runs
    * on the broadcast-joined orders side. */
  def orderPriorityClasses(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q8 shape: a nation's market share — the fraction of
    * STANDARD-part revenue sold into the EUROPE region's customers
    * that NATION_0's suppliers supplied, per order year. The six-way
    * join keeps every dimension broadcast (part filtered to one type;
    * nation twice — customer side restricted to the region, supplier
    * side carrying the share flag); the fact tables meet in one
    * orderkey join. Share = exact-decimal nation volume over
    * exact-decimal total, divided once as doubles. */
  def nationMarketShare(s: SparkSession, dir: String): DataFrame = {
    val vol = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    val custRegion = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_0", vol)
          .otherwise(lit(0).cast("decimal(12,2)"))).as("nation_dec"),
        sum(vol).as("total_dec"))
      .select(col("o_year").cast("long").as("o_year"),
        round(col("nation_dec"), 2).cast("double").as("nation_volume"),
        round(col("total_dec"), 2).cast("double").as("total_volume"),
        round(col("nation_dec").cast("double") / col("total_dec").cast("double"), 6)
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private def R(e: String, n: Int): String = graft.OracleSql.round(e, n)

  /** Exact-decimal discounted price sum (see [[money]]). */
  private val discPriceDec =
    "sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))"

  val defs: Map[String, QueryDef] = Map(
    "returned_item_customers" -> QueryDef(returnedItemCustomers, Some(
      s"""WITH rev AS (
        |  SELECT o_custkey, $discPriceDec AS rev_dec
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, n_name,
        |  ${R("c_acctbal", 2)} AS acctbal,
        |  CAST(round(rev_dec, 2) AS DOUBLE) AS revenue
        |FROM rev JOIN customer ON o_custkey = c_custkey
        |         JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),
    "order_priority_classes" -> QueryDef(orderPriorityClasses, Some(
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin)),
    "nation_market_share" -> QueryDef(nationMarketShare, Some(
      s"""WITH vols AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    sum(CASE WHEN n2.n_name = 'NATION_0'
        |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |        ELSE 0 END) AS nation_dec,
        |    $discPriceDec AS total_dec
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        |  GROUP BY 1)
        |SELECT o_year,
        |  CAST(round(nation_dec, 2) AS DOUBLE) AS nation_volume,
        |  CAST(round(total_dec, 2) AS DOUBLE) AS total_volume,
        |  ${R("CAST(nation_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)", 6)} AS mkt_share
        |FROM vols ORDER BY o_year""".stripMargin)),
    "orders_scd2_enrich" -> QueryDef(ordersScd2Enrich, Some(
      """WITH dim AS (
        |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
        |    '1995-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
        |  FROM customer WHERE c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE),
        |    '1995-01-01', '1996-01-01'
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS DOUBLE),
        |    '1996-01-01', CAST(NULL AS VARCHAR)
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT o_orderkey, o_custkey,
        |  CAST(round(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE) AS total_price,
        |  acctbal AS acctbal_at_order, valid_from
        |FROM orders JOIN dim ON o_custkey = c_custkey
        |  AND o_orderdate >= CAST(valid_from AS TIMESTAMP)
        |  AND (valid_to IS NULL OR o_orderdate < CAST(valid_to AS TIMESTAMP))
        |ORDER BY o_orderkey""".stripMargin)),
    "customer_revenue_share" -> QueryDef(customerRevenueShare, Some(
      s"""WITH rev AS (SELECT n_name, c_custkey,
         |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name, c_custkey),
         |w AS (SELECT n_name, c_custkey, rev,
         |    sum(rev) OVER (PARTITION BY n_name) AS nation_rev,
         |    row_number() OVER (PARTITION BY n_name ORDER BY rev DESC, c_custkey) AS rnk
         |  FROM rev)
         |SELECT n_name, rnk, c_custkey,
         |  CAST(round(rev, 2) AS DOUBLE) AS revenue,
         |  ${graft.OracleSql.round("CAST(rev AS DOUBLE) / CAST(nation_rev AS DOUBLE)", 6)} AS share
         |FROM w WHERE rnk <= 5 ORDER BY n_name, rnk""".stripMargin)),
    "customer_dim_scd2" -> QueryDef(customerDimScd2, Some(
      """WITH dim AS (SELECT c_custkey, c_name,
        |    CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer)
        |SELECT c_custkey, c_name, CAST(bal AS DOUBLE) AS acctbal,
        |  '1995-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
        |  true AS is_current
        |FROM dim WHERE c_custkey % 7 <> 0
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(bal AS DOUBLE),
        |  '1995-01-01', '1996-01-01', false
        |FROM dim WHERE c_custkey % 7 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(bal + 100 AS DOUBLE),
        |  '1996-01-01', CAST(NULL AS VARCHAR), true
        |FROM dim WHERE c_custkey % 7 = 0
        |ORDER BY c_custkey, valid_from""".stripMargin)),
    "excess_supplier_parts" -> QueryDef(excessSupplierParts, Some(
      s"""WITH sp AS (SELECT l_suppkey, l_partkey,
         |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS sp_qty
         |  FROM lineitem GROUP BY l_suppkey, l_partkey),
         |pt AS (SELECT l_partkey, sum(sp_qty) AS part_qty FROM sp GROUP BY l_partkey)
         |SELECT sp.l_partkey, l_suppkey, s_name,
         |  CAST(sp_qty AS DOUBLE) AS sp_qty, CAST(part_qty AS DOUBLE) AS part_qty,
         |  ${graft.OracleSql.round("CAST(sp_qty AS DOUBLE) / CAST(part_qty AS DOUBLE)", 4)} AS share
         |FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |WHERE sp_qty * 20 > part_qty * 3
         |ORDER BY sp.l_partkey, l_suppkey""".stripMargin)),
    "late_shipment_orders" -> QueryDef(lateShipmentOrders, Some(
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),
    "nation_pair_trade" -> QueryDef(nationPairTrade, Some(
      s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |  CAST(round($discPriceDec, 2) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE cn.n_name <> sn.n_name
         |GROUP BY 1, 2 ORDER BY cust_nation, supp_nation""".stripMargin)),
    "quantity_band_revenue" -> QueryDef(quantityBandRevenue, Some(
      s"""SELECT CAST(round($discPriceDec, 2) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
         |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
         |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin)),
    "dormant_customer_balance" -> QueryDef(dormantCustomerBalance, Some(
      """WITH thr AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS thr
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name AS nation, count(*) AS n_customers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_balance
        |FROM customer
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_acctbal > (SELECT thr FROM thr)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY nation""".stripMargin)),
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
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin)),
    "promo_revenue_ratio" -> QueryDef(promoRevenueRatio, Some(
      s"""SELECT month, ${R("CAST(promo AS DOUBLE)", 2)} AS promo_revenue,
        |  ${R("CAST(total AS DOUBLE)", 2)} AS total_revenue,
        |  ${R("100 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)", 4)} AS promo_pct
        |FROM (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
        |    sum(CASE WHEN p_type LIKE 'PROMO%'
        |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |        ELSE 0 END) AS promo,
        |    $discPriceDec AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |ORDER BY month""".stripMargin)),
    "top_supplier_revenue" -> QueryDef(topSupplierRevenue, Some(
      s"""WITH rev AS (
        |  SELECT l_suppkey, $discPriceDec AS rev_dec FROM lineitem GROUP BY 1)
        |SELECT s_suppkey, s_name, ${R("CAST(rev_dec AS DOUBLE)", 2)} AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)),
    "small_quantity_revenue" -> QueryDef(smallQuantityRevenue, Some(
      s"""WITH pa AS (
        |  SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qsum,
        |    count(*) AS qcnt
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, count(*) AS n_lines,
        |  ${R("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7", 2)} AS avg_weekly_revenue
        |FROM lineitem JOIN pa ON l_partkey = pk JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_quantity AS DECIMAL(12,2)) * 2 * qcnt < qsum
        |GROUP BY 1 ORDER BY p_brand""".stripMargin)),
    "large_volume_customers" -> QueryDef(largeVolumeCustomers, Some(
      s"""WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sq FROM lineitem
        |  GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, ${R("sq", 2)} AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin)),
    "customer_dim_upsert" -> QueryDef(customerDimUpsert, Some(
      """WITH cur AS (
        |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(13,2)) AS acctbal
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS DECIMAL(13,2)) AS acctbal
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + (SELECT max(c_custkey) FROM customer), CAST(50 AS DECIMAL(13,2))
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
        |  CAST(coalesce(u.acctbal, c.acctbal) AS DOUBLE) AS acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL THEN 'update'
        |       WHEN u.c_custkey IS NOT NULL THEN 'insert' ELSE 'keep' END AS action
        |FROM cur c FULL OUTER JOIN upd u ON c.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin)),
    "forecast_revenue" -> QueryDef(forecastRevenue, Some(
      s"""SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)),
    // pr/cd live in [0,1] — sub-unit, so the scale-28 staging variant
    // (see OracleSql.roundDecSub) avoids the digit-18 double rounding
    "order_rank_stats" -> QueryDef(orderRankStats, Some(
      s"""SELECT o_orderkey, o_orderstatus,
        |  CAST(${graft.OracleSql.roundDecSub("percent_rank() OVER w", 9)} AS DOUBLE) AS pr,
        |  CAST(${graft.OracleSql.roundDecSub("cume_dist() OVER w", 9)} AS DOUBLE) AS cd,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin)),
    "returned_item_suppliers" -> QueryDef(returnedItemSuppliers, Some(
      """WITH ret AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |multi AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(DISTINCT l_suppkey) > 1),
        |solo AS (
        |  SELECT l_orderkey FROM ret GROUP BY 1 HAVING count(*) = 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM ret
        |JOIN multi USING (l_orderkey)
        |JOIN solo USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin)))
}
