package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching.
  *
  * The library's HLL surface (`approx_user_cardinality`,
  * `approx_count_distinct`) is engine-private — its register layout is
  * not reproducible by an independent engine, so its driver row is
  * rows-only. KMV (k-minimum-values) is the oracle-checkable
  * complement: keep the k smallest values of a uniform hash of the
  * distinct keys; with r_k = the k-th smallest hash scaled to [0, 1),
  * E[distinct] ≈ (k-1)/r_k (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07). Every step
  * is deterministic — the hash is the library's M61+fmix64 family,
  * reproducible in DuckDB with HUGEINT arithmetic — so the driver row
  * is a full hash check, unlike any RNG- or register-based sketch.
  *
  * Scale posture: the hash is computed in the scan stage; `k smallest`
  * is a TakeOrderedAndProject (per-partition top-k, then a k-row merge
  * on the driver — never a global sort); the estimate is an aggregate
  * over ≤ k rows. The sketch is mergeable (union of KMV sets, re-take
  * k smallest), which is what makes it usable per-partition /
  * per-day at 100 TB.
  */
object Sketches {

  private def hash63(c: Column): Column =
    graft.functions.textFunctions.m61_fmix_hash63(c)

  /** Generic KMV distinct-count over any key column: one row
    * (k_eff, kth_hash, est_users). With fewer than k distinct hashes
    * the sketch IS the distinct set and the estimate is exact
    * (k_eff < k branch); otherwise est = (k-1) · 2^63 / kth_hash. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 32): DataFrame = {
    val topk = df
      .select(hash63(key).as("hm"))
      .distinct()
      .orderBy(col("hm"))
      .limit(k)
    topk.agg(count(lit(1)).as("k_eff"), max(col("hm")).as("kth_hash"))
      .select(col("k_eff"), col("kth_hash"),
        round(when(col("k_eff") < k, col("k_eff").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
            col("kth_hash").cast("double")), 4).as("est_users"))
  }

  /** KMV estimate of distinct users in `events`. */
  def kmvUserCardinality(s: SparkSession, dir: String, k: Int = 32): DataFrame =
    kmvDistinct(Tables(s, dir, "events"), col("user_id"), k)

  val defs: Map[String, QueryDef] = Map(
    "sketch_kmv_users" -> QueryDef((s, d) => kmvUserCardinality(s, d), Some(
      s"""WITH du AS (SELECT DISTINCT user_id FROM events),
         |${OracleSql.m61FmixScalarCtes("du", "CAST(user_id AS VARCHAR)")},
         |hm AS (SELECT DISTINCT h & 9223372036854775807 AS hm FROM mh),
         |topk AS (SELECT hm FROM hm ORDER BY hm LIMIT 32),
         |agg AS (SELECT count(*) AS k_eff, max(hm) AS kth_hash FROM topk)
         |SELECT k_eff, kth_hash,
         |  ${OracleSql.round(
             "CASE WHEN k_eff < 32 THEN CAST(k_eff AS DOUBLE) ELSE 31.0 * 9223372036854775808.0 / CAST(kth_hash AS DOUBLE) END", 4)} AS est_users
         |FROM agg""".stripMargin)))
}
