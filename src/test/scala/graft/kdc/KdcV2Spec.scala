package graft.kdc

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kdc.v2.KdcScan

/** The DataSourceV2 log table ([[graft.kdc.v2.KdcLogTableProvider]]):
  * result parity with the RDD-based parse paths, predicate pushdown
  * and column pruning reaching the scan, split alignment under
  * adversarial split sizes, and multi-batch streaming admission. */
class KdcV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture: String = KdcParseQueries.fixtureDir()

  private def v2(options: (String, String)*): DataFrame = {
    val r = spark.read.format("kdclog")
    options.foreach { case (k, v) => r.option(k, v) }
    r.load(fixture)
  }

  private def kdcScan(df: DataFrame): KdcScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n${df.queryExecution.executedPlan}")
    scans.collect { case s: KdcScan => s } match {
      case Seq(s) => s
      case other => fail(s"expected exactly one KdcScan, got $other")
    }
  }

  test("v2 batch read equals the shuffle-by-file parse path") {
    val viaV2 = v2().collect().map(_.toString).sorted.toSeq
    val viaRdd = KdcSource.records(spark, fixture).toDF()
      .collect().map(_.toString).sorted.toSeq
    assert(viaV2 == viaRdd)
  }

  test("realm/reqtype predicates and column pruning reach the scan") {
    val q = v2()
      .filter(col("crealm") === "SQUILL.DEMENTIA.ORG" &&
        col("req_type") === "AUTH")
      .select(col("client"), col("ts"))
    val rows = q.collect()
    val scan = kdcScan(q)
    val pushedStr = scan.pushedFilters.mkString(", ")
    assert(pushedStr.contains("EqualTo(crealm,SQUILL.DEMENTIA.ORG)"),
      s"realm predicate not pushed: $pushedStr")
    assert(pushedStr.contains("EqualTo(req_type,AUTH)"),
      s"reqtype predicate not pushed: $pushedStr")
    // pruning: only the columns the query touches reach materialization
    val read = scan.readSchema().fieldNames.toSet
    assert(read.subsetOf(Set("client", "ts", "crealm", "req_type")),
      s"scan materializes more than required: $read")
    // semantics unchanged by the pushdown: 9 home-realm AS sessions
    // (cg2v x2, alice x3 incl. the failed one, mallory, expired,
    // nopre, plain) — the foreign-realm visitor is filtered AT THE
    // SCAN, never materialized
    assert(rows.length == 9, s"expected 9 AS sessions, got ${rows.length}")
  }

  test("ts range predicates push (lexical ISO order is chronological)") {
    val q = v2().filter(col("ts") >= "2015-11-23T00:00:00")
      .select(col("client"), col("ts"))
    val scan = kdcScan(q)
    assert(scan.pushedFilters.mkString.contains("GreaterThanOrEqual(ts,2015-11-23T00:00:00)"),
      s"ts bound not pushed: ${scan.pushedFilters.mkString(", ")}")
    val got = q.collect().map(_.getString(1)).sorted
    assert(got.nonEmpty && got.forall(_ >= "2015-11-23T00:00:00"))
  }

  test("adversarial 256-byte splits: aligned reader repairs torn sessions") {
    val whole = v2().collect().map(_.toString).sorted.toSeq
    val torn = v2("maxSplitBytes" -> "256").collect().map(_.toString).sorted.toSeq
    assert(torn == whole, "split alignment changed the parsed sessions")
  }

  test("streaming: file-arrival micro-batches converge to the batch answer") {
    import spark.implicits._
    val ds = spark.readStream.format("kdclog")
      .option("maxFilesPerTrigger", "1")
      .load(fixture)
      .as(Encoders.product[KdcLogRecord])
    val agg = KdcQueries.userAuthStats(ds)
    val got = graft.streaming.StreamingPipeline.runOneShot(
      agg, "kdc_v2_stream", "complete", Seq("client"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val want = KdcQueries.userAuthStats(KdcSource.records(spark, fixture))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
    // the admission bound must have produced MULTIPLE batches (2 files
    // x maxFilesPerTrigger=1): a single-batch replay would pass the
    // equality vacuously and prove nothing about file-arrival
    val prog = graft.streaming.StreamingPipeline.lastOneShotProgress
    assert(prog.exists(_.batchId >= 1),
      s"expected >= 2 micro-batches, last progress: $prog")
  }
}
