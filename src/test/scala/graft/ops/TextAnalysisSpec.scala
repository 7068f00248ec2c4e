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

  test("fingerprintPairs df-cap drops boilerplate postings, keeps genuine pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 docs sharing one boilerplate fingerprint (df = 20 > cap = 5)
    // would contribute C(20,2) = 190 quadratic candidates; two docs
    // share two rare fingerprints (df = 2) and must survive the guard.
    val boiler = (1L to 20L).flatMap(d => Seq((d, 999L)))
    val rare = Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L))
    val fp = (boiler ++ rare).toDF("doc_id", "fp")
    val guarded = TextAnalysis
      .fingerprintPairsFromPostings(fp, minShared = 2, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((100L, 101L)),
      s"expected only the rare pair, got $guarded")
    // sanity: without the cap the boilerplate pairs flood the output
    val unguarded = TextAnalysis
      .fingerprintPairsFromPostings(fp, minShared = 1, maxDf = Int.MaxValue)
      .count()
    assert(unguarded == 190 + 1)
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
