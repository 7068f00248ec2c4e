package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session exposes graft functions in SQL") {
    // `spark.sql.extensions` is a STATIC conf — honored only when the
    // first SparkContext of the JVM is created (verified standalone);
    // inside the shared-context test JVM we exercise the same class
    // through the programmatic builder hook instead.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       l2_norm(array(3.0d, 4.0d)) AS n,
          |       simhash64(array(CAST(5 AS BIGINT))) AS sh,
          |       size(winnow_fingerprints(split('a b c d e f g h i j k l', ' '))) AS nf,
          |       lang_scores('the quick fox is in the barn')[1] > 0 AS en_hit,
          |       word_ngrams(split('a b c a b c', ' '), 3) AS ng
          |""".stripMargin).head()
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 5.0)
      assert(r.getLong(2) == 5L) // single hash: its bits win every vote... plus zero-vote bits set
      assert(r.getInt(3) > 0)
      assert(r.getBoolean(4))
      // distinct shingles in first-occurrence order
      assert(r.getSeq[String](5) == Seq("a b c", "b c a", "c a b"))
    } finally {
      // keep the shared SparkContext alive for other suites; just
      // detach this session so later getOrCreate calls start clean
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
