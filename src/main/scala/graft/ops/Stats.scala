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
    val monthly = Tables(s, dir, "orders")
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
    }))
}
