package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row
  * with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native as-of join; per the extension preference order
  * this is tier (a): a composition of built-ins. Both sides are
  * union-tagged and processed with ONE window pass — `last(..,
  * ignoreNulls)` of the right-side payload over (key) ordered by
  * (ts, side) — i.e. a single shuffle on the key, no row explosion,
  * no range cross-product. At 100 TB this is the textbook distributed
  * as-of plan: shuffle both inputs once by key, sort within
  * partitions, stream. Ties at equal ts resolve right-before-left
  * (matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which the
  * oracle uses).
  */
object AsofJoin {

  /** Generic backward as-of join.
    * @param left  (key, ts, leftCols…)
    * @param right (key, ts, rightCols…) — its non-key/ts columns are
    *              emitted with values from the matched as-of row.
    *              MUST be unique per (key, ts): with duplicates the
    *              window's ordering among equal (ts, side) rows is not
    *              deterministic, so which payload wins would vary
    *              run-to-run (callers dedupe first, as
    *              [[purchaseAfterClick]] does).
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   key: String, ts: String): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != ts)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(
        right.select(struct(rightPayload.map(col): _*)).schema.head.dataType))
    val r = right.select(
      col(key), col(ts), lit(0).as("__side"),
      struct(rightPayload.map(col): _*).as("__rpay"))
    val leftCols = left.columns
    val unioned = l.select((leftCols.map(col) :+ col("__side") :+ col("__rpay")): _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == key || c == ts) col(c) else lit(null).as(c))
          :+ col("__side") :+ col("__rpay")): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = matched.select(
      (leftCols.map(col) ++
        rightPayload.map(c => col("__asof").getField(c).as(c))): _*)
    out
  }

  /** Forward as-of join — for each left row, the EARLIEST right row
    * with the same key and `rightTs >= leftTs`. Same single-window
    * plan as [[asofBackward]], mirrored: left rows sort before right
    * rows at equal ts, and `first(.., ignoreNulls)` over the
    * current-row-to-unbounded-following frame picks the next right
    * payload (null = no match, left-join semantics). Right MUST be
    * unique per (key, ts), as in [[asofBackward]]. */
  def asofForward(left: DataFrame, right: DataFrame,
                  key: String, ts: String): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != ts)
    val l = left.withColumn("__side", lit(0))
      .withColumn("__rpay", lit(null).cast(
        right.select(struct(rightPayload.map(col): _*)).schema.head.dataType))
    val r = right.select(
      col(key), col(ts), lit(1).as("__side"),
      struct(rightPayload.map(col): _*).as("__rpay"))
    val leftCols = left.columns
    val unioned = l.select((leftCols.map(col) :+ col("__side") :+ col("__rpay")): _*)
      .unionByName(r.select(
        (leftCols.map(c => if (c == key || c == ts) col(c) else lit(null).as(c))
          :+ col("__side") :+ col("__rpay")): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("__asof", first(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    matched.select(
      (leftCols.map(col) ++
        rightPayload.map(c => col("__asof").getField(c).as(c))): _*)
  }

  /** For each click event, the next (or same-instant) purchase by the
    * same user — the conversion-attribution shape; epoch-millis. */
  def clickToNextPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = EventQueries.events(s, dir)
      .withColumn("ms", unix_millis(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms"), col("event_id").as("click_id"))
    asofForward(clicks, purchases, "user_id", "ms")
      .select(col("click_id"), col("user_id"), col("ms").as("click_ms"),
        col("purchase_id"))
      .orderBy(col("click_id"))
  }

  /** For each purchase event, the most recent prior (or same-instant)
    * click by the same user; epoch-millis throughout. */
  def purchaseAfterClick(s: SparkSession, dir: String): DataFrame = {
    val ev = EventQueries.events(s, dir)
      .withColumn("ms", unix_millis(col("ts")))
    // dedupe clicks to one per (user, ms) so equal-ms ties are unique
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), col("event_id").as("purchase_id"))
    asofBackward(purchases, clicks, "user_id", "ms")
      .select(col("purchase_id"), col("user_id"), col("ms").as("purchase_ms"),
        col("click_id"))
      .orderBy(col("purchase_id"))
  }

  val defs: Map[String, QueryDef] = Map(
    "asof_click_next_purchase" -> QueryDef(clickToNextPurchase, Some(
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |purchases AS (SELECT user_id, ms, max(event_id) AS purchase_id
        |              FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ms),
        |clicks AS (SELECT user_id, ms, event_id AS click_id
        |           FROM ev WHERE event_type = 'click')
        |SELECT c.click_id, c.user_id, c.ms AS click_ms, p.purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ms <= p.ms
        |ORDER BY c.click_id""".stripMargin)),
    "asof_purchase_click" -> QueryDef(purchaseAfterClick, Some(
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |clicks AS (SELECT user_id, ms, max(event_id) AS click_id
        |           FROM ev WHERE event_type = 'click' GROUP BY user_id, ms),
        |purchases AS (SELECT user_id, ms, event_id AS purchase_id
        |              FROM ev WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ms AS purchase_ms, c.click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ms >= c.ms
        |ORDER BY p.purchase_id""".stripMargin)))
}
