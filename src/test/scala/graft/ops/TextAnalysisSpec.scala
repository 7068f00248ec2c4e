package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("langId identifies fixture sentences in each profiled language") {
    import spark.implicits._
    val fixtures = Seq(
      ("en", "the quick brown fox is jumping over the lazy dog and it is fine"),
      ("de", "der schnelle braune fuchs springt über den faulen hund und die katze"),
      ("fr", "le renard brun rapide saute par dessus le chien paresseux que les gens aiment"),
      ("es", "el rápido zorro marrón salta sobre el perro perezoso que los niños quieren"))
    val df = fixtures.toDF("truth", "text")
    val got = TextAnalysis.langId(df).select("truth", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    for ((truth, pred) <- got) assert(pred == truth, s"$truth predicted as $pred")
  }

  test("langId on empty text yields 'und'") {
    import spark.implicits._
    val got = TextAnalysis.langId(Seq(("x", "")).toDF("id", "text"))
      .select("pred_lang").head().getString(0)
    assert(got == "und")
  }

  test("fingerprints: near-dup docs share fingerprints, unrelated don't") {
    val pairs = TextAnalysis.fingerprintPairs(spark, dir, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(spark, dir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & pairs).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall")
  }

  test("quality components are consistent") {
    val row = TextAnalysis.qualityScores(spark, dir)
      .filter("doc_id = 0").head()
    val nTokens = row.getAs[Long]("n_tokens")
    val ttr = row.getAs[Double]("ttr")
    assert(nTokens > 0 && ttr > 0 && ttr <= 1.0)
    val score = row.getAs[Double]("quality_score")
    assert(score >= 0 && score <= 1.0)
  }
}
