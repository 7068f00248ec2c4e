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
}
