package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Invariant properties of the scrub layer over generated corpora —
  * the per-row kernels are checked AS SPARK PLANS (one batch per
  * generated corpus, not one job per case). Drives ScalaCheck `Gen`
  * directly (the scalatestplus bridge is not in the offline cache).
  *
  * Invariants:
  *  - piiScrub is idempotent: scrubbing scrubbed text finds 0 PII and
  *    changes nothing (placeholders contain no scrubbable patterns).
  *  - normalize is idempotent, and its output alphabet is [a-z0-9 ]
  *    with no leading/trailing/double spaces.
  *  - lineDedup conserves lines (kept + removed = total per doc) and
  *    never removes a line that lives in < minDocs distinct docs.
  */
class ScrubPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val word = Gen.oneOf("table", "scan", "agg", "the", "a",
    "Mixed-Case", "punct!!", "x@y.zz", "10.1.2.3", "555-0123", "plain")
  private val doc = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val d = doc.apply(Gen.Parameters.default, Seed(seed * 1000 + i))
        .getOrElse("fallback text")
      (i.toLong, d)
    }

  test("piiScrub: scrubbed output is a fixpoint with zero remaining PII") {
    import spark.implicits._
    for (seed <- 0L until 20L) {
      val df = corpus(seed, 30).toDF("doc_id", "text")
      val once = Scrub.piiScrub(df)
        .select($"doc_id", $"scrubbed".as("text"))
      val twice = Scrub.piiScrub(once)
        .select($"doc_id", $"n_emails", $"n_ipv4", $"n_phones",
          $"scrubbed", $"text")
        .collect()
      twice.foreach { r =>
        assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0,
          s"seed=$seed doc=${r.getLong(0)}: PII survived one scrub")
        assert(r.getString(4) == r.getString(5),
          s"seed=$seed doc=${r.getLong(0)}: second scrub changed text")
      }
    }
  }

  test("normalize: idempotent, closed alphabet, canonical spacing") {
    import spark.implicits._
    for (seed <- 20L until 40L) {
      val df = corpus(seed, 30).toDF("doc_id", "text")
      val once = Scrub.normalize(df).select($"doc_id", $"normalized".as("text"))
      val twice = Scrub.normalize(once)
        .select($"doc_id", $"text", $"normalized").collect()
      twice.foreach { r =>
        val (t, t2) = (r.getString(1), r.getString(2))
        assert(t == t2, s"seed=$seed doc=${r.getLong(0)}: not idempotent")
        assert(t.matches("[a-z0-9 ]*"), s"alphabet leak: '$t'")
        assert(!t.startsWith(" ") && !t.endsWith(" ") && !t.contains("  "),
          s"spacing not canonical: '$t'")
      }
    }
  }

  test("lineDedup: conservation and the distinct-doc threshold") {
    import spark.implicits._
    for (seed <- 40L until 55L) {
      val df = corpus(seed, 40).toDF("doc_id", "text")
      val lines = Scrub.linesOf(df, lineLen = 2)
      val perDoc = lines.groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // lines in >= 2 distinct docs (the ground truth the operator
      // must reproduce through its hashed plan)
      val dup = lines.collect().map(r => (r.getLong(0), r.getString(2)))
        .groupBy(_._2).filter(_._2.map(_._1).distinct.length >= 2).keySet
      val out = Scrub.lineDedup(lines, minDocs = 2L).collect()
      out.foreach { r =>
        val id = r.getLong(0)
        assert(r.getLong(1) + r.getLong(2) == perDoc(id),
          s"seed=$seed doc=$id: kept+removed != total")
        // kept == 0 ⇒ text is "" (whose split yields one empty
        // element), so only inspect lines when something was kept
        if (r.getLong(1) > 0) r.getString(3).split("\n", -1).foreach { l =>
          assert(!dup.contains(l), s"seed=$seed doc=$id kept a dup line '$l'")
        }
      }
      assert(out.map(_.getLong(0)).toSet == perDoc.keySet)
    }
  }
}
