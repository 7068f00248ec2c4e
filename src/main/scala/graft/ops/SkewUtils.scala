package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §7.4 #5: KDC keys are
  * heavy-hitter-skewed — `krbtgt`-style principals dominate).
  *
  * AQE's skew-join splitting handles joins at runtime; for
  * aggregations whose partial state is large (e.g. collect-style or
  * high-cardinality-distinct buffers), two-stage salted aggregation
  * bounds any single reducer's key volume: stage 1 aggregates on
  * (key, salt) spreading one hot key over `nSalts` reducers, stage 2
  * merges the per-salt partials. For algebraic aggregates
  * (count/sum/min/max) results are exactly the unsalted answer
  * (SkewUtilsSpec pins this).
  */
object SkewUtils {

  /** Deterministic row salt in [0, nSalts): hash of the whole row —
    * stable across retries (rand() is not, and breaks task retry
    * exactly-once semantics at scale). */
  private def rowSalt(df: DataFrame, nSalts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(nSalts))

  /** Salted count per key: exact same result as
    * `df.groupBy(key).count()` with hot keys spread over nSalts
    * reducers in the first exchange. */
  def saltedCount(df: DataFrame, key: String, nSalts: Int = 16,
                  resultCol: String = "n"): DataFrame =
    df.withColumn("__salt", rowSalt(df, nSalts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(resultCol))

  /** Salted equi-join for skewed keys: the BIG side gets a
    * deterministic row salt in [0, nSalts); the small side replicates
    * each row nSalts times; joining on (key, salt) spreads one hot
    * key's rows over nSalts reducers. Output is EXACTLY the plain
    * join (every big row matches exactly its one salt replica).
    * Complements AQE's skew split: salting is the static fallback
    * when a hot key exceeds what runtime splitting can rebalance
    * (documented at Dedup's maxBucket math). Costs nSalts× the small
    * side on the wire — use when small·nSalts ≪ big. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt", rowSalt(big, nSalts))
    val repl = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(repl, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted sum/min/max/count bundle — the UserTimeRec shape
    * (first/last/count) under skew. */
  def saltedUserTimes(df: DataFrame, key: String, tsCol: String,
                      nSalts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, nSalts))
      .groupBy(col(key), col("__salt"))
      .agg(
        min(col(tsCol)).as("__min"),
        max(col(tsCol)).as("__max"),
        count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(
        min(col("__min")).as("first_ts"),
        max(col("__max")).as("last_ts"),
        sum(col("__n")).as("n"))
}
