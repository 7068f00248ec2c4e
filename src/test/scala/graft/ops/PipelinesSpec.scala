package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The composed pipelines must agree with their component operators —
  * the driver oracle then cross-checks the same results against the
  * independent DuckDB composition. */
class PipelinesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cleanCorpus = dedup survivors ∩ quality ∩ lang, componentwise") {
    val got = Pipelines.cleanCorpus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val keep = Dedup.exactDedup(spark, dir).collect().map(_.getLong(0)).toSet
    val quality = TextAnalysis.qualityScores(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    val lang = TextAnalysis.langIdQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = keep.toSeq.sorted
      .filter(id => quality(id) >= 0.35 && lang(id) == "en")
      .map(id => (id, "en", quality(id)))
    assert(got.toSeq == expected)
    assert(got.nonEmpty && got.length < keep.size) // both filters bite
  }

  test("neardupRemoval drops exactly the doc_b side of jaccard pairs") {
    val all = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val removedExpected = Dedup.jaccardPairs(spark, dir).collect()
      .map(_.getLong(1)).toSet
    val got = Pipelines.neardupRemoval(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(removedExpected.nonEmpty)
    assert(got == all -- removedExpected)
  }
}
