package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** PII scrubbing + line-level dedup semantics on planted fixtures. */
class ScrubSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("piiScrub counts and redacts every planted PII class") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at alice.smith+x@corp.example.org today"),
      (2L, "server 192.168.0.17 and 10.0.0.1 are up"),
      (3L, "call 555-0142 re: invoice"),
      (4L, "no pii here at all"),
      (5L, "both bob@ex.io and 8.8.8.8 and 555-9999")
    ).toDF("doc_id", "text")
    val got = Scrub.piiScrub(df).orderBy("doc_id")
      .select("doc_id", "n_emails", "n_ipv4", "n_phones", "scrubbed")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got(0) == ((1L, 1L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(got(1) == ((2L, 0L, 2L, 0L, "server <IP> and <IP> are up")))
    assert(got(2) == ((3L, 0L, 0L, 1L, "call <PHONE> re: invoice")))
    assert(got(3) == ((4L, 0L, 0L, 0L, "no pii here at all")))
    assert(got(4) == ((5L, 1L, 1L, 1L, "both <EMAIL> and <IP> and <PHONE>")))
  }

  test("piiScrub driver query plants on the doc_id lattice and scrubs it all") {
    val rows = Scrub.piiScrubQuery(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) == (if (id % 4 == 0) 1L else 0L), s"ips doc $id")
      assert(r.getLong(3) == (if (id % 5 == 0) 1L else 0L), s"phones doc $id")
      val scrubbed = r.getString(4)
      assert(!scrubbed.contains("@"), s"email survived scrub in doc $id")
      assert(!scrubbed.matches(""".*\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b.*"""))
      assert(!scrubbed.matches(""".*\b\d{3}-\d{4}\b.*"""))
    }
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    import spark.implicits._
    val df = Seq(
      (1L, "  Hello,   WORLD!!  "),
      (2L, "already clean text"),
      (3L, "Tabs\tand\nnewlines  mix")
    ).toDF("doc_id", "text")
    val got = Scrub.normalize(df).orderBy("doc_id")
      .select("doc_id", "n_chars_raw", "n_chars_norm", "normalized")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 20L, 11L, "hello world")))
    assert(got(1) == ((2L, 18L, 18L, "already clean text")))
    assert(got(2) == ((3L, 22L, 21L, "tabs and newlines mix")))
  }

  test("normalize driver query undoes exactly the planted noise") {
    val rows = Scrub.normalizeQuery(spark, dir).collect()
    val clean = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // planted noise (case flip, pads, "The  End!!") must normalize
      // back to the original clean text + " the end"
      assert(r.getString(3) == clean(r.getLong(0)) + " the end",
        s"doc ${r.getLong(0)} normalized wrong")
      assert(r.getLong(1) > r.getLong(2), "raw must exceed normalized length")
    }
  }

  test("lineDedup removes cross-doc boilerplate, keeps order, reassembles") {
    import spark.implicits._
    // "license header" shared by docs 1..3; doc 4 repeats a line only
    // WITHIN itself (must NOT be removed at minDocs=2)
    val lines = Seq(
      (1L, 0, "apache license v2"), (1L, 1, "unique alpha"), (1L, 2, "unique beta"),
      (2L, 0, "apache license v2"), (2L, 1, "unique gamma"),
      (3L, 0, "apache license v2"),
      (4L, 0, "self repeat"), (4L, 1, "self repeat"), (4L, 2, "tail")
    ).toDF("doc_id", "pos", "line")
    val got = Scrub.lineDedup(lines, minDocs = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, "unique alpha\nunique beta"),
      (2L, 1L, 1L, "unique gamma"),
      (3L, 0L, 1L, ""),
      (4L, 3L, 0L, "self repeat\nself repeat\ntail")))
  }

  test("driver line-dedup query fires on the real corpus and conserves lines") {
    val got = Scrub.lineDedupQuery(spark, dir).collect()
    assert(got.nonEmpty)
    val removed = got.map(_.getLong(2)).sum
    assert(removed > 0, "31-word vocab must produce cross-doc 3-word line collisions")
    // kept + removed = total lines of each doc
    val lines = Scrub.linesOf(
      graft.Tables(spark, dir, "documents").select("doc_id", "text"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == lines(r.getLong(0)),
        s"line conservation failed for doc ${r.getLong(0)}")
    }
  }

  test("shuffleOrder is a permutation, deterministic, and hash-ordered") {
    val a = Pipelines.shuffleOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = Pipelines.shuffleOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq, "must be run-to-run deterministic")
    assert(a.map(_._1).toSeq == (1L to a.length).toSeq, "ord must be 1..n dense")
    assert(a.map(_._2).distinct.length == a.length, "every doc exactly once")
    assert(a.map(_._2).toSeq != a.map(_._2).sorted.toSeq,
      "hash order must differ from doc_id order")
  }

  test("dedupKeepBest keeps the max-quality doc per cluster, loners intact") {
    val clusters = Dedup.neardupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = TextAnalysis.qualityScores(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    val got = Pipelines.dedupKeepBest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val byCluster = clusters.groupBy(_._2)
    val expectBest = byCluster.map { case (_, members) =>
      val ids = members.map(_._1)
      val best = ids.minBy(id => (-quality(id), id))
      (best, quality(best), ids.length.toLong)
    }.toSet
    val clustered = clusters.map(_._1).toSet
    val expectLoners = quality.keySet.diff(clustered)
      .map(id => (id, quality(id), 1L))
    assert(got.toSet == (expectBest ++ expectLoners))
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    assert(expectBest.exists(_._3 > 1), "fixture must contain a real cluster")
  }

  test("contaminationBloom output is bit-identical to the exact operator") {
    val exact = Pipelines.contaminationReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = Pipelines.contaminationBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }
}
