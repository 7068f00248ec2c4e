package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair rows whose timestamps fall within a
  * band of each other, with NO equi-key to join on.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoop — O(n·m)
  * comparisons, a non-starter at scale. The standard distributed plan
  * is BINNING: quantize time into `window`-sized bins, explode each
  * anchor to its three candidate bins (a row within ±window of ts can
  * only live in bin(ts)-1 .. bin(ts)+1), equi-join on the bin, then
  * refine with the exact band predicate. One shuffle on bin keys;
  * per-bin cost is (anchors-in-bin × events-in-3-bins), bounded by
  * temporal density, with AQE skew-splitting on hot bins. Each
  * non-anchor row lands in exactly one bin and each (anchor, bin) pair
  * is distinct, so no dedup pass is needed.
  *
  * This is extension tier (a) — composed from built-ins; the bin
  * arithmetic is plain codegen'd column math. */
object RangeJoin {

  /** Count, for every anchor event of `anchorType`, the other events
    * (any type, any user) within ±`windowMs` of it. Anchors with no
    * neighbor in band are absent (inner-join semantics, mirrored by
    * the oracle). */
  def nearbyEventCounts(s: SparkSession, dir: String,
                        anchorType: String = "purchase",
                        windowMs: Long = 3600000L): DataFrame = {
    val e = EventQueries.events(s, dir)
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val anchors = e.filter(col("event_type") === anchorType)
      .select(col("event_id").as("anchor_id"), col("ms").as("ams"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("off"))
      .select(col("anchor_id"), col("ams"),
        (floor(col("ams") / windowMs) + col("off")).as("bin"))
    val binned = e.select(col("event_id"), col("ms"),
      floor(col("ms") / windowMs).as("bin"))
    anchors.join(binned, "bin")
      .filter(abs(col("ms") - col("ams")) <= windowMs &&
        col("event_id") =!= col("anchor_id"))
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_nearby"))
      .orderBy(col("anchor_id"))
  }

  val defs: Map[String, QueryDef] = Map(
    "range_join_nearby" -> QueryDef((s, d) => nearbyEventCounts(s, d), Some(
      """WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |a AS (SELECT event_id AS anchor_id, ms AS ams FROM e WHERE event_type = 'purchase')
        |SELECT anchor_id, count(*) AS n_nearby
        |FROM a JOIN e ON abs(e.ms - a.ams) <= 3600000 AND e.event_id <> a.anchor_id
        |GROUP BY anchor_id ORDER BY anchor_id""".stripMargin)))
}
