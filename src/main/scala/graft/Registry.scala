package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL
  * run by the driver on the same parquet tables (Verify.scala contract).
  * Queries without an oracle get the driver's weaker rows-only check.
  *
  * Determinism rules for oracle-checked queries (SURVEY.md §7.4):
  * stable ORDER BY on both sides, timestamps surfaced as epoch-millis
  * bigints (the events table is nanosecond parquet — engines disagree
  * on sub-microsecond display), doubles rounded (2dp money, 4dp ratios),
  * column names aliased identically in Spark and SQL.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    notes: String = "")

object OracleSql {
  /** DuckDB emulation of Spark's `round(expr, n)` on doubles.
    *
    * Spark rounds the *shortest decimal repr* of the double
    * (`BigDecimal.decimal(d).setScale(n, HALF_UP)`); DuckDB's plain
    * `round` re-derives the value and can land on the other side of a
    * half-cent boundary (e.g. 186686.29499999998: Spark→.29,
    * DuckDB round→.30). Routing through VARCHAR (shortest repr) then a
    * wide DECIMAL reproduces Spark's behavior bit-for-bit — validated
    * over boundary cases in scripts/check.py development.
    */
  def round(expr: String, n: Int): String =
    s"CAST(round(CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,18)), $n) AS DOUBLE)"
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
