package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint checking (the Deequ-shaped
  * layer): column profiles (null/distinct counts) and declarative
  * dataset checks (uniqueness, referential integrity, domain bounds)
  * that gate a pipeline run before anything downstream trusts the
  * data.
  *
  * Scale posture: the profile is ONE aggregate pass per table
  * (multiple exact distinct counts compile to an Expand — the exact
  * flavor is the oracle-checkable one; swap `approx_count_distinct`
  * at 100 TB where ±2% beats an Expand shuffle, same contract as the
  * HLL row). Checks are each a single aggregate or anti-join count —
  * the FK check is a broadcast anti-join when the dimension fits.
  *
  * The events profile reads `ts` in its RAW on-disk form (never a
  * converted copy): on nanosecond testdata vintages ns→µs truncation
  * is not bijective, so a distinct count over a converted column
  * could disagree with an engine that counts native values; reading
  * raw keeps both engines counting the same physical values on every
  * vintage.
  */
object DataQuality {

  /** Per-column null and exact distinct counts for the events table:
    * one row per column. */
  def profileEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
    }
    val stack = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    ev.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stack) as (column_name, n_nulls, n_distinct)")
      .orderBy(col("column_name"))
  }

  /** Declarative dataset checks, one row per check:
    * (check, metric, passed) where metric counts the VIOLATIONS —
    * passed ⇔ metric = 0. */
  def checks(s: SparkSession, dir: String): DataFrame =
    checksOn(Tables(s, dir, "events"), Tables(s, dir, "orders"),
      Tables(s, dir, "customer"), Tables(s, dir, "lineitem"),
      Tables(s, dir, "documents"))

  /** Generic variant over the five table frames. */
  def checksOn(events: DataFrame, orders: DataFrame, customer: DataFrame,
               lineitem: DataFrame, documents: DataFrame): DataFrame = {
    def check(name: String, metric: DataFrame): DataFrame =
      metric.select(lit(name).as("check_name"), col("metric"),
        (col("metric") === 0L).as("passed"))
    val dupes = events.agg(
      (count(lit(1)) - countDistinct(col("event_id"))).as("metric"))
    val fk = orders.join(broadcast(customer.select(col("c_custkey"))),
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("metric"))
    val qty = lineitem.filter(col("l_quantity") <= 0)
      .agg(count(lit(1)).as("metric"))
    val value = events.filter(col("value") < 0)
      .agg(count(lit(1)).as("metric"))
    val docs = documents.filter(col("text").isNull || length(col("text")) === 0)
      .agg(count(lit(1)).as("metric"))
    Seq(
      check("docs_text_nonempty", docs),
      check("event_id_unique", dupes),
      check("events_value_nonnegative", value),
      check("lineitem_quantity_positive", qty),
      check("orders_custkey_fk", fk))
      .reduce(_ unionByName _)
      .orderBy(col("check_name"))
  }

  /** Pearson chi-square test of independence for the (lang, source)
    * contingency table — the "is provenance confounded with language"
    * check a mixture rebalance should consult. The full grid
    * (including zero-count cells, which still contribute their
    * expected count) is the margins' cross join; per-cell
    * contributions (n−e)²/e are exact IEEE doubles over integer
    * margins, rounded to 9dp DECIMAL before the order-free sum (the
    * [[graft.OracleSql.roundDec]] ruling). Output: one row
    * (n_cells, dof, chi2). */
  def chiSquareLangSource(s: SparkSession, dir: String): DataFrame =
    chiSquareOn(Tables(s, dir, "documents"), "lang", "source")

  /** Generic variant: independence of any two categorical columns.
    * NULL categories are EXCLUDED from the test (documented contract):
    * a NULL-keyed group would feed the margins but never match the
    * grid's equality join, silently zeroing its observed counts and
    * inflating χ² — exactly the dirty data a DQ check meets. */
  def chiSquareOn(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val docs = df.select(col(aCol).as("lang"), col(bCol).as("source"))
      .filter(col("lang").isNotNull && col("source").isNotNull)
    val ct = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    val r = ct.groupBy(col("lang")).agg(sum(col("n")).as("rn"))
    val c = ct.groupBy(col("source")).agg(sum(col("n")).as("cn"))
    val t = ct.agg(sum(col("n")).as("tot"))
    val grid = r.crossJoin(c).crossJoin(broadcast(t))
      .join(ct, Seq("lang", "source"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("e",
        col("rn").cast("double") * col("cn").cast("double") / col("tot").cast("double"))
      .withColumn("cb", round(
        (col("n").cast("double") - col("e")) * (col("n").cast("double") - col("e")) / col("e"),
        9).cast("decimal(20,9)"))
    grid.agg(
        count(lit(1)).as("n_cells"),
        ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1)).as("dof"),
        round(sum(col("cb")).cast("double"), 4).as("chi2"))
  }

  // ------------------------------------------------------------ registry

  /** Join-key skew profile — the statistic that decides salting and
    * AQE skew thresholds BEFORE a join melts an executor: for each
    * high-traffic join key, the row/key counts, the hottest key's
    * count, and the share of rows concentrated on the top-10 keys.
    * All integers plus one long/long division, so the 6dp share is
    * engine-exact. One groupBy per key column plus a 10-row
    * TakeOrdered — profile cost stays one aggregate pass per table at
    * any scale, and the output is O(#columns profiled). */
  def joinKeySkew(s: SparkSession, dir: String): DataFrame = {
    def profile(table: String, key: String): DataFrame = {
      val counts = Tables(s, dir, table)
        .groupBy(col(key).cast("string").as("k"))
        .agg(count(lit(1)).as("cnt"))
      val top10 = counts.orderBy(desc("cnt"), col("k")).limit(10)
        .agg(sum(col("cnt")).as("top10_cnt"))
      counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"))
        .crossJoin(broadcast(top10))
        .select(lit(s"$table.$key").as("key_col"), col("n_rows"),
          col("n_keys"), col("max_cnt"), col("top10_cnt"),
          round(col("top10_cnt").cast("double") / col("n_rows").cast("double"), 6)
            .as("top10_share"))
    }
    profile("events", "user_id")
      .unionAll(profile("lineitem", "l_orderkey"))
      .unionAll(profile("documents", "source"))
      .orderBy(col("key_col"))
  }

  val defs: Map[String, QueryDef] = Map(
    "join_key_skew" -> QueryDef(joinKeySkew, Some {
      def prof(table: String, key: String) =
        s"""SELECT '$table.$key' AS key_col, CAST(sum(cnt) AS BIGINT) AS n_rows,
           |  count(*) AS n_keys, max(cnt) AS max_cnt,
           |  CAST((SELECT sum(cnt) FROM (
           |     SELECT cnt FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS cnt
           |                      FROM $table GROUP BY 1)
           |     ORDER BY cnt DESC, k LIMIT 10)) AS BIGINT) AS top10_cnt,
           |  ${graft.OracleSql.round(
                 s"""CAST((SELECT sum(cnt) FROM (
           |     SELECT cnt FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS cnt
           |                      FROM $table GROUP BY 1)
           |     ORDER BY cnt DESC, k LIMIT 10)) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)""", 6)} AS top10_share
           |FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS cnt FROM $table GROUP BY 1)""".stripMargin
      s"""${prof("events", "user_id")}
         |UNION ALL
         |${prof("lineitem", "l_orderkey")}
         |UNION ALL
         |${prof("documents", "source")}
         |ORDER BY key_col""".stripMargin
    }),
    "dq_profile_events" -> QueryDef((s, d) => profileEvents(s, d), Some(
      """SELECT 'event_id' AS column_name, count(*) FILTER (WHERE event_id IS NULL) AS n_nulls, count(DISTINCT event_id) AS n_distinct FROM events
        |UNION ALL SELECT 'ts', count(*) FILTER (WHERE ts IS NULL), count(DISTINCT ts) FROM events
        |UNION ALL SELECT 'user_id', count(*) FILTER (WHERE user_id IS NULL), count(DISTINCT user_id) FROM events
        |UNION ALL SELECT 'event_type', count(*) FILTER (WHERE event_type IS NULL), count(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'value', count(*) FILTER (WHERE value IS NULL), count(DISTINCT value) FROM events
        |UNION ALL SELECT 'props', count(*) FILTER (WHERE props IS NULL), count(DISTINCT props) FROM events
        |ORDER BY column_name""".stripMargin)),
    "dq_chi_square" -> QueryDef((s, d) => chiSquareLangSource(s, d), Some(
      s"""WITH ct AS (SELECT lang, source, count(*) AS n FROM documents
         |            WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT lang, sum(n) AS rn FROM ct GROUP BY 1),
         |c AS (SELECT source, sum(n) AS cn FROM ct GROUP BY 1),
         |t AS (SELECT sum(n) AS tot FROM ct),
         |grid AS (SELECT r.lang, c.source, rn, cn, tot, coalesce(ct.n, 0) AS n
         |         FROM r CROSS JOIN c CROSS JOIN t
         |         LEFT JOIN ct ON r.lang = ct.lang AND c.source = ct.source),
         |cb AS (SELECT lang, source,
         |         ${graft.OracleSql.roundDec(
                    "(CAST(n AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(tot AS DOUBLE)) * " +
                    "(CAST(n AS DOUBLE) - CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(tot AS DOUBLE)) / " +
                    "(CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(tot AS DOUBLE))", 9)} AS cb
         |       FROM grid)
         |SELECT count(*) AS n_cells,
         |  (SELECT (count(*) - 1) FROM r) * (SELECT (count(*) - 1) FROM c) AS dof,
         |  ${graft.OracleSql.round("CAST(sum(cb) AS DOUBLE)", 4)} AS chi2
         |FROM cb""".stripMargin)),
    "dq_checks" -> QueryDef((s, d) => checks(s, d), Some(
      """WITH fk AS (SELECT CAST(count(*) AS BIGINT) AS m
        |            FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey),
        |rows AS (
        |  SELECT 'docs_text_nonempty' AS check_name,
        |         count(*) FILTER (WHERE text IS NULL OR length(text) = 0) AS metric
        |  FROM documents
        |  UNION ALL SELECT 'event_id_unique', count(*) - count(DISTINCT event_id) FROM events
        |  UNION ALL SELECT 'events_value_nonnegative', count(*) FILTER (WHERE value < 0) FROM events
        |  UNION ALL SELECT 'lineitem_quantity_positive', count(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
        |  UNION ALL SELECT 'orders_custkey_fk', m FROM fk)
        |SELECT check_name, metric, metric = 0 AS passed
        |FROM rows ORDER BY check_name""".stripMargin)))
}
