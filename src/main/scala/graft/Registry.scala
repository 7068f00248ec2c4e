package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL
  * run by the driver on the same parquet tables (Verify.scala contract).
  * Queries without an oracle get the driver's weaker rows-only check.
  *
  * Determinism rules for oracle-checked queries (SURVEY.md §7.4):
  * stable ORDER BY on both sides, timestamps surfaced as epoch-millis
  * bigints (engines disagree on timestamp display; the events table
  * has shipped as both nanosecond and microsecond parquet across
  * testdata vintages), doubles rounded (2dp money, 4dp ratios),
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

  /** Same shortest-repr rounding, surfaced as DECIMAL(20,n) instead of
    * DOUBLE — for per-term score contributions that are then SUMMED:
    * decimal addition is exact and order-independent, so a cross-term
    * sum of these cannot diverge between engines the way a float sum
    * over a nondeterministic partition order can. The decimal→decimal
    * cast never routes back through a double. Spark-side mirror:
    * `round(x, n).cast("decimal(20,n)")` (Spark's double→decimal cast
    * uses the shortest decimal repr, so the 9dp value round-trips
    * exactly at these magnitudes). */
  def roundDec(expr: String, n: Int): String =
    s"CAST(round(CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,18)), $n) AS DECIMAL(20,$n))"

  /** [[roundDec]] for SUB-UNIT magnitudes: a double < 1 spends
    * shortest-repr digits on leading zeros, so its full repr can
    * exceed 18 fractional digits — DECIMAL(38,18) staging then rounds
    * at digit 18 BEFORE the n-dp round (double rounding; it flipped a
    * PageRank half-way case at sf0.01). Scale-28 staging keeps every
    * shortest-repr digit of any |x| < 10^10; prefer this variant
    * whenever the value can sit below 1. */
  def roundDecSub(expr: String, n: Int): String =
    s"CAST(round(CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,28)), $n) AS DECIMAL(20,$n))"

  /** DuckDB constants/recipes for reproducing the library's M61+fmix64
    * hash family ([[graft.functions.M61TokenHashes]]) with HUGEINT
    * modular arithmetic. */
  def two64: String = "CAST(18446744073709551616 AS HUGEINT)"
  def two63: String = "CAST(9223372036854775808 AS HUGEINT)"

  /** (h * C) % 2^64 via hi/lo 32-bit split: intermediates stay
    * < 2^97 < INT128 max, so the signed HUGEINT never overflows. */
  def mulmod(h: String, c: Long): String = {
    val hi = c >>> 32
    val lo = c & 0xffffffffL
    s"((($h * CAST($hi AS HUGEINT)) % 4294967296) * 4294967296 + $h * CAST($lo AS HUGEINT)) % $two64"
  }

  /** CTE chain applying murmur fmix64 to a NON-NEGATIVE BIGINT key
    * expression per row of `src` — the integer-key flavor of
    * [[m61FmixScalarCtes]] (same staged xor/mulmod HUGEINT
    * arithmetic, minus the string fold). Emits `${p}0..${p}3` and a
    * final CTE `$p` = all of `src`'s columns plus `$out`
    * (two's-complement BIGINT, identical to the JVM
    * [[graft.functions.TextExpressions.fmix64]]). */
  def fmix64Ctes(src: String, keyExpr: String,
                 out: String = "h", p: String = "fx"): String =
    s"""${p}0 AS (SELECT *, xor(CAST($keyExpr AS HUGEINT),
       |                        CAST($keyExpr AS HUGEINT) >> 33) AS __h FROM $src),
       |${p}1 AS (SELECT * REPLACE (${mulmod("__h", 0xff51afd7ed558ccdL)} AS __h) FROM ${p}0),
       |${p}2 AS (SELECT * REPLACE (xor(__h, __h >> 33) AS __h) FROM ${p}1),
       |${p}3 AS (SELECT * REPLACE (xor(__h, __h >> 33) AS __h) FROM (SELECT * REPLACE (${mulmod("__h", 0xc4ceb9fe1a85ec53L)} AS __h) FROM ${p}2)),
       |$p AS (SELECT * EXCLUDE (__h),
       |         CAST(CASE WHEN __h >= $two63 THEN __h - $two64 ELSE __h END AS BIGINT) AS $out
       |       FROM ${p}3)""".stripMargin

  /** CTE chain hashing a SCALAR string expression per row of `src`
    * with M61-polynomial fold + murmur fmix64 — the scalar flavor of
    * Dedup's list-based shingle-hash chain. Emits CTEs `${p}0..${p}4`
    * and a final CTE `$p` = all of `src`'s columns plus `$out`
    * (two's-complement BIGINT, identical to the JVM kernel's signed
    * long). Staged CTEs, not nested expressions: every xor(h, h>>33)
    * uses h twice, so inlining would double the expression per stage. */
  def m61FmixScalarCtes(src: String, keyExpr: String,
                        out: String = "h", p: String = "mh"): String = {
    val m61 = graft.functions.TextExpressions.M61
    s"""${p}0 AS (SELECT *, list_reduce([CAST(0 AS HUGEINT)] ||
       |    list_filter(list_transform(string_split($keyExpr, ''), ch -> CAST(unicode(ch) AS HUGEINT)), c -> c >= 0),
       |    (a, c) -> (a * 32 + c) % $m61) AS __h FROM $src),
       |${p}1 AS (SELECT * REPLACE (xor(__h, __h >> 33) AS __h) FROM ${p}0),
       |${p}2 AS (SELECT * REPLACE (${mulmod("__h", 0xff51afd7ed558ccdL)} AS __h) FROM ${p}1),
       |${p}3 AS (SELECT * REPLACE (xor(__h, __h >> 33) AS __h) FROM ${p}2),
       |${p}4 AS (SELECT * REPLACE (xor(__h, __h >> 33) AS __h) FROM (SELECT * REPLACE (${mulmod("__h", 0xc4ceb9fe1a85ec53L)} AS __h) FROM ${p}3)),
       |$p AS (SELECT * EXCLUDE (__h),
       |         CAST(CASE WHEN __h >= $two63 THEN __h - $two64 ELSE __h END AS BIGINT) AS $out
       |       FROM ${p}4)""".stripMargin
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
