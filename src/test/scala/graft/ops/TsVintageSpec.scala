package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events table has shipped as both TIMESTAMP(NANOS) (read as a
  * nanos long under the nanosAsLong legacy flag) and TIMESTAMP(MICROS)
  * (read natively as NTZ) across driver testdata vintages.
  * EventQueries.normalizeTs is the single seam both the batch and
  * streaming readers share; this spec pins that the two vintages
  * converge to identical instants, so a future testdata regeneration
  * in either direction cannot silently shift query results. */
class TsVintageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("nanos-long and micros-NTZ vintages normalize to the same instants") {
    import spark.implicits._
    val micros = Seq(0L, 999L, 1704067200000000L, 1706657176220123L)
    val nanosVintage = micros.toDF("us")
      .select((col("us") * 1000).as("ts"))
    val ntzVintage = micros.toDF("us")
      .select(expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)").as("ts"))
    def instants(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      EventQueries.normalizeTs(df)
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
    assert(instants(nanosVintage) == micros.sorted)
    assert(instants(ntzVintage) == micros.sorted)
  }

  test("nanos fold floors sub-microsecond precision (matches DuckDB epoch_* floor)") {
    import spark.implicits._
    // 1500 ns and 1999 ns both floor to 1 µs; -1 ns floors to -1 µs
    // under integral DIV (Spark's DIV is floor-toward-negative-infinity
    // for these magnitudes only when exact; pin the positive cases the
    // testdata can actually contain — epoch nanos are all positive)
    val df = Seq(1500L, 1999L, 2000L).toDF("ts")
    val got = EventQueries.normalizeTs(df)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 1L, 2L))
  }
}
