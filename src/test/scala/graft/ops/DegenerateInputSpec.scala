package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input smoke: every generic operator must return an
  * EMPTY (or identity) result on an empty corpus and survive
  * single-row / single-token inputs — not throw. These are the shapes
  * a real pipeline hits on an empty partition, a fresh ingest
  * directory, or a filtered-to-nothing stage boundary. */
class DegenerateInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private val empty = Seq.empty[(Long, String)]
  private val one = Seq((0L, "single"))
  private val short = Seq((0L, "a"), (1L, "b c"))

  test("text/dedup operators are empty-safe and single-row-safe") {
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("jaccardPairs", d => Dedup.jaccardPairsOn(d)),
      ("spanDupStats", d => Dedup.spanDupStatsOn(d)),
      ("fuzzyPairs", d => Dedup.fuzzyPairsOn(d)),
      ("ingestDedup", d => Dedup.ingestDedupOn(d, splitId = 1L)),
      ("lmSurprisal", d => TextAnalysis.lmSurprisalOn(d)),
      ("lmBigram", d => TextAnalysis.lmBigramSurprisalOn(d)),
      ("pmiPairs", d => TextAnalysis.pmiPairsOn(d, minCoDf = 1)),
      ("bm25", d => Retrieval.bm25TopKOn(d)),
      ("docChunks", d => Curation.docChunksOn(d)),
      ("vocabOov", d => Curation.vocabOovRateOn(d)),
      ("containmentPairs", d => Dedup.containmentPairsOn(d)),
      ("cdcChunkStats", d => Dedup.cdcChunkStatsOn(d)),
      ("docNovelty", d => Curation.docNoveltyOn(d)),
      ("bpeLearnMerges", d => TextAnalysis.bpeLearnMergesOn(d, steps = 3)),
      ("bpeTokenizeStats", d => TextAnalysis.bpeTokenizeStatsOn(d, steps = 3)))
    for ((name, op) <- ops) {
      assert(op(docs(empty)).count() == 0L, s"$name on empty corpus")
      op(docs(one)).count() // must not throw
      op(docs(short)).count() // must not throw
    }
  }

  test("pair operators emit nothing for a corpus with no qualifying docs") {
    // every doc below the shingle/span minimum token counts
    val tiny = docs(Seq((0L, "a b"), (1L, "c d")))
    assert(Dedup.jaccardPairsOn(tiny).count() == 0L)
    assert(Dedup.spanDupStatsOn(tiny).collect().forall(_.getLong(3) == 0L))
    assert(TextAnalysis.pmiPairsOn(tiny, minCoDf = 5).count() == 0L)
  }

  test("cluster and semantic dedup handle an empty edge/vector set") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clustersFromEdges(noEdges).count() == 0L)
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    assert(Similarity.semanticDedupOn(noVecs).count() == 0L)
    assert(Similarity.clusterAssignOn(noVecs).count() == 0L)
    // an edgeless graph census is the identity row, not a crash
    val census = Graph.triangleStats(
      Seq.empty[(Long, Long)].toDF("u", "v")).collect()
    assert(census.length == 1 &&
      (0 to 3).forall(i => census(0).getLong(i) == 0L) &&
      census(0).getDouble(4) == 0.0)
  }

  test("sampling and splits on an empty frame are empty, not errors") {
    import spark.implicits._
    val e = Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "n_chars")
    assert(Curation.mixtureBalanceOn(e, "lang", "doc_id").count() == 0L)
  }

  test("ANN operators: empty vector frames are empty or fail fast clearly") {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(Similarity.neardupPairsOn(noVecs, threshold = 0.4).count() == 0L)
    assert(Similarity.lshTopKOn(noVecs, noVecs, k = 5).count() == 0L)
    assert(Similarity.dbscanClustersOn(noVecs, eps = 0.4, minPts = 2).count() == 0L)
    val noLabeled = Seq.empty[(Long, Int, Seq[Double])].toDF("vec_id", "label", "v")
    assert(Similarity.contrastivePairsOn(noLabeled, nQueries = 5).count() == 0L)
    assert(Similarity.truncationRecallOn(
      noVecs.withColumnRenamed("id", "vec_id"), nQueries = 5, k = 3, dims = 8).count() == 0L)
    // a 0-centroid IVF model cannot answer anything — train must say
    // so instead of failing later inside cellOf's analysis
    val ex = intercept[IllegalArgumentException] {
      Ivf.train(noVecs, k = 4, iters = 1)
    }
    assert(ex.getMessage.contains("non-empty"))
    // PQ training has the same fail-fast contract
    val ex2 = intercept[IllegalArgumentException] {
      Pq.train(noVecs, m = 4, ksub = 4, iters = 1)
    }
    assert(ex2.getMessage.contains("non-empty"))
  }

  test("round-6 table ops: empty and single-row inputs don't throw") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("degen6").toString
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq.empty[(Long, Long, String, Double, java.sql.Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Long, Double)]
      .toDF("l_suppkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq.empty[(Long, String, Double, Long)]
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, String)].toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq.empty[(Long, Long)].toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // events family: empty in, empty out
    assert(Insights.sessionPathTopk(spark, dir).count() == 0L)
    assert(Insights.dailyValueChangepoint(spark, dir).count() == 0L)
    assert(Insights.userTimeWeightedValue(spark, dir).count() == 0L)
    assert(Stats.churnedUsers(spark, dir).count() == 0L)
    // empty orders: z-order stats must not divide by a null range
    assert(Layout.zorderLayoutStats(spark, dir).count() == 0L)
    assert(Stats.revenueTrendSlopes(spark, dir).count() == 0L)
    assert(TpchQueries.excessSupplierParts(spark, dir).count() == 0L)
    assert(TpchQueries.customerDimScd2(spark, dir).count() == 0L)
    assert(TpchQueries.ordersScd2Enrich(spark, dir).count() == 0L)
    // single-row events survive the window/lead paths
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Insights.sessionPathTopk(spark, dir).count() == 0L)
    assert(Insights.userTimeWeightedValue(spark, dir).count() == 0L)
    assert(Insights.userValueGapfill(spark, dir).count() == 1L)
  }

  test("FrameGuard: calendar frames pass, a fact-sized frame is refused by name") {
    // at the bound passes; one past it fails fast with the query named
    val ok = FrameGuard.assertCalendarBounded(
      spark.range(10).toDF("x"), "in_bounds", bound = 10)
    assert(ok.count() == 10L)
    val big = spark.range(11).toDF("x")
    val e = intercept[IllegalArgumentException] {
      FrameGuard.assertCalendarBounded(big, "daily_guard_probe", bound = 10)
    }
    assert(e.getMessage.contains("daily_guard_probe") &&
      e.getMessage.contains("11"),
      s"guard error must name the query and the size: ${e.getMessage}")
    // the refusal path must RELEASE the cache — a refused fact-sized
    // frame squatting in the block manager until a global clearCache
    // is exactly the frame too big to keep around (round-9 advice)
    assert(big.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      s"refused frame left persisted at ${big.storageLevel}")
    spark.catalog.clearCache()
  }
}
