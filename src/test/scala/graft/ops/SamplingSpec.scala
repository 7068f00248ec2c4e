package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("leakage audit finds id-split leaks; the cluster-consistent split has none by construction") {
    val leaks = Sampling.splitLeakagePairs(spark, dir).collect()
    assert(leaks.nonEmpty,
      "the testdata's planted near-dups must leak under the per-id split")
    leaks.foreach(r => assert(r.getString(2) != r.getString(3)))
    // the repair: every near-dup pair's members share a split
    val cs = Sampling.clusterConsistentSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val pairs = Dedup.jaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(cs(a)._2 == cs(b)._2, s"pair ($a,$b) split ${cs(a)._2}/${cs(b)._2}")
    }
    // loners degenerate to the plain id split
    val idSplit = Sampling.splitAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cs.filter { case (id, (cid, _)) => cid == id && !clustered(id) }
      .foreach { case (id, (_, sp)) => assert(sp == idSplit(id), s"loner $id moved") }
  }

  test("hash samples are deterministic and compose by threshold") {
    def ids(thr: String): Set[Long] =
      Sampling.sampleDocs(spark, dir, thr).collect().map(_.getLong(0)).toSet
    val p10 = ids("1a")
    assert(ids("1a") == p10, "rerun must select identical rows")
    val p50 = ids("80")
    // a smaller threshold is a SUBSET of a larger one under one hash —
    // the property RNG sampling does not have
    assert(p10.subsetOf(p50))
    assert(p10.nonEmpty && p50.size > p10.size)
  }

  test("split assignment partitions the corpus deterministically") {
    val rows = Sampling.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == n, "every document must get exactly one split")
    // membership is exactly the documented bucket ranges
    for ((id, bucket, split) <- rows) {
      val want = if (bucket < "e6") "train" else if (bucket < "f3") "val" else "test"
      assert(split == want, s"doc $id bucket $bucket got $split")
    }
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"splits present: ${bySplit.keySet}")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // rerun-stable
    val again = Sampling.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(rows.sameElements(again))
  }

  test("weighted sample favors heavy docs and is rerun-stable") {
    val rows = Sampling.weightedSampleDocs(spark, dir, n = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 50)
    // keys are ln(u)/w with u in (0,1] — never positive
    assert(rows.forall(_._3 <= 0.0))
    // output ordered by (key desc, doc_id)
    val keys = rows.map(r => (-r._3, r._1))
    assert(keys.sameElements(keys.sorted))
    // rerun-stable
    val again = Sampling.weightedSampleDocs(spark, dir, n = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sameElements(again))
    // weighting works: the selected docs skew heavier than the corpus
    // (inclusion probability ∝ weight for a weighted sample)
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0))
    val corpusMean = all.sum.toDouble / all.length
    val sampleMean = rows.map(_._2).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("token budget selection is greedy-maximal and exactly ordered") {
    val rows = Pipelines.tokenBudgetSelect(spark, dir, budget = 2000L)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // cumulative sums are consistent and within budget
    var run = 0L
    for ((_, _, nt, cum) <- rows) { run += nt; assert(cum == run && cum <= 2000L) }
    // quality is non-increasing down the selection (doc_id breaks ties)
    val qs = rows.map(_._2)
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    // greedy-maximal: the next-best unselected doc would not have fit
    val all = TextAnalysis.qualityScores(spark, dir)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    val selected = rows.map(_._1).toSet
    val nextBest = all.find(r => !selected.contains(r._1))
    for ((_, _, nt) <- nextBest) assert(run + nt > 2000L)
  }

  test("Neyman allocation: a zero-variance stratum earns zero, budget is exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neyman").toString
    // two equal-size strata: 'flat' is constant (sigma = 0), 'wild'
    // alternates +-100 (sigma = 100). Proportional splits 500/500;
    // Neyman sends the WHOLE budget to the stratum with information.
    val rows = (0 until 200).map { i =>
      val (t, v) = if (i % 2 == 0) ("flat", 5.0)
                   else ("wild", if (i % 4 == 1) 100.0 else -100.0)
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:0${i % 6}:00"), t, v)
    }
    rows.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Sampling.neymanAllocation(spark, dir, budget = 1000).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("flat") == ((100L, 0.0, 0L, 500L)), s"${got("flat")}")
    assert(got("wild") == ((100L, 100.0, 1000L, 500L)), s"${got("wild")}")
    assert(got.values.map(_._3).sum == 1000L, "Neyman allocation must spend the exact budget")
  }
}
