package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Heavy-hitter sketch guarantees on a planted Zipf stream — the
  * driver row's tiny event-type domain never exercises candidate
  * pruning, so this is where the Misra-Gries machinery is actually
  * proven: a 2000-key domain, ~64-counter summaries, and a result
  * that must STILL be exactly the brute-force GROUP BY ... HAVING
  * answer because the exact recount filters every sketch artifact. */
class SketchesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** key_i repeated ~2000/i times, i = 1..2000 (Zipf-ish tail of 1s). */
  private def zipf = {
    import spark.implicits._
    val rows = for {
      i <- 1 to 2000
      _ <- 1 to math.max(1, 2000 / i)
    } yield s"key_$i"
    rows.toDF("key").repartition(8)
  }

  test("kmv overlap: exact below k, inclusion-exclusion recovers the planted intersection") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kmvov").toString
    // clickers 0..19, purchasers 10..29 → |A| = |B| = 20, |A∩B| = 10,
    // |A∪B| = 30 — all below k = 32, so every sketch IS its distinct
    // set and the estimates are exact
    val rows =
      (0L to 19L).map(u => (u, "click")) ++ (10L to 29L).map(u => (u, "purchase"))
    rows.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Sketches.kmvUserOverlap(spark, tmp).collect().head
    assert((got.getDouble(0), got.getDouble(1), got.getDouble(2), got.getDouble(3))
      == ((20.0, 20.0, 30.0, 10.0)), s"$got")
    // past k the estimates approximate: 600/600 users, 200 shared
    val big = ((0L to 599L).map(u => (u, "click")) ++
      (400L to 999L).map(u => (u, "purchase")))
    big.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val est = Sketches.kmvUserOverlap(spark, tmp).collect().head
    assert(math.abs(est.getDouble(0) - 600) < 250, s"est_a ${est.getDouble(0)}")
    assert(math.abs(est.getDouble(2) - 1000) < 400, s"est_union ${est.getDouble(2)}")
    assert(est.getDouble(3) >= 0.0, "intersection floored at zero")
  }

  test("sketch-then-verify equals brute force exactly on a Zipf stream") {
    val df = zipf
    val n = df.count()
    val got = Sketches.heavyHitters(df, col("key"), 1, 50, k = 64)
      .select("k", "cnt").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = df.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 50 > n)
      .orderBy(desc("cnt"), col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(want.nonEmpty, "fixture must contain true heavy hitters")
    assert(got.toSeq == want.toSeq)
  }

  test("candidate set is sketch-bounded, far below the key domain") {
    val df = zipf
    val nCand = Sketches.mgCandidates(df, col("key"), k = 64).count()
    val domain = df.select("key").distinct().count()
    assert(domain == 2000)
    // <= k per partition (8 partitions), and a fraction of the domain
    assert(nCand <= 64L * 8, s"candidates $nCand exceed k*partitions")
    assert(nCand < domain / 2, s"sketch did not prune: $nCand of $domain")
  }

  test("phi below the Misra-Gries guarantee is rejected") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(zipf, col("key"), 1, 100, k = 64)
    }
  }

  test("KmvAgg: duplicates never occupy slots, merge re-trims, order cancels") {
    val agg = new KmvAgg(4)
    // duplicates collapse — 3 distinct values fill only 3 slots
    val a = Seq(5L, 1L, 5L, 9L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(a.hs == Seq(1L, 5L, 9L))
    // merge unions then keeps the 4 smallest distinct
    val b = Seq(2L, 7L, 11L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b).hs == Seq(1L, 2L, 3L, 5L))
    // arrival order and grouping cancel: any shuffle, same state
    val xs = Seq(8L, 3L, 8L, 12L, 1L, 7L, 3L)
    val lhs = xs.foldLeft(agg.zero)(agg.reduce)
    val rhs = agg.merge(
      xs.take(3).foldLeft(agg.zero)(agg.reduce),
      xs.drop(3).reverse.foldLeft(agg.zero)(agg.reduce))
    assert(lhs == rhs)
  }

  test("streaming KMV equals the batch sketch and runs stateful on RocksDB") {
    val dir = "/root/testdata/sf0.001"
    val batch = Sketches.kmvUserCardinality(spark, dir).collect().head
    val stream = Sketches.kmvUserCardinalityStreaming(spark, dir).collect().head
    assert(stream.toSeq == batch.toSeq,
      s"stream ${stream.toSeq} != batch ${batch.toSeq}")
    val progress = graft.streaming.StreamingPipeline.lastOneShotProgress
      .getOrElse(fail("runOneShot did not record progress"))
    assert(progress.stateOperators.nonEmpty,
      "expected the KMV aggregate to hold streaming state")
  }
}
