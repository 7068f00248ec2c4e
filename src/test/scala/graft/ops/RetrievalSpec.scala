package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent mini-implementation of the scoring contract: rounded
    * 9dp decimal contributions, exact decimal sum, 4dp final round —
    * the same arithmetic the operator and the DuckDB oracle promise. */
  private def bm25Expected(corpus: Seq[(Long, String)], queryTerms: Seq[String],
                           k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val docs = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docs.size
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val dfreq = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size)
    docs.map { case (id, toks) =>
      val dl = toks.size
      val contribs = queryTerms.flatMap { term =>
        val tf = toks.count(_ == term)
        if (tf == 0) None
        else {
          val df = dfreq(term)
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          val tfp = (tf * (k1 + 1.0)) / (tf + (dl / avgdl * b + (1.0 - b)) * k1)
          Some(BigDecimal.decimal(idf * tfp)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      id -> (if (contribs.isEmpty) Double.NaN
             else BigDecimal.decimal(contribs.sum.toDouble)
               .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap.filterNot(_._2.isNaN)
  }

  test("bm25 matches an independent reimplementation on a planted corpus") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "apple banana"),
      (1L, "apple apple apple"),
      (2L, "banana cherry cherry"),
      (3L, "cherry cherry cherry"))
    val got = Retrieval.bm25TopKOn(corpus.toDF("doc_id", "text"),
        nQueries = 1, qLen = 4, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    val want = bm25Expected(corpus, Seq("apple", "banana"))
    assert(got.map(_._1).toSet == want.keySet, "candidate set mismatch")
    for ((id, score, _) <- got)
      assert(score == want(id), s"doc $id: got $score want ${want(id)}")
    // ranks strictly follow (score desc, doc_id)
    val ordered = got.sortBy(_._3)
    assert(ordered.map(x => (-x._2, x._1)).sameElements(
      ordered.map(x => (-x._2, x._1)).sorted), "rank order broken")
  }

  test("bm25 on the corpus: k bounded, scores positive and descending per query") {
    val rows = Retrieval.bm25TopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 10, s"query $q overflowed k")
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).sameElements(1L to byRank.length),
        s"query $q ranks not contiguous")
      val scores = byRank.map(_._3)
      assert(scores.forall(_ > 0), s"query $q non-positive score")
      assert(scores.zip(scores.tail).forall { case (a, c) => a >= c },
        s"query $q scores not descending")
    }
  }

  test("pruned bm25: exact scores for candidates, common-term-only docs dropped") {
    import spark.implicits._
    // query = doc 0's terms: rare, mid, com1, com2. dfs: rare=2 < mid=3
    // < com1=com2 (most of the corpus) → informative = {rare, mid}.
    // doc 20 matches ONLY the common terms: full bm25 scores it, the
    // pruned variant must not open it. doc 21 matches `mid` (plus a
    // common term): it survives, and its score must include the common
    // term's contribution too — pruning gates candidacy, never scoring.
    val corpus = Seq(
      (0L, "rare mid com1 com2"),
      (20L, "com1 com2 pad pad"),
      (21L, "mid com1 pad pad"),
      (22L, "rare pad pad pad"),
      (23L, "com1 com2 pad pad"),
      (24L, "com1 com2 pad pad"),
      (25L, "mid com2 pad pad"))
    val df = corpus.toDF("doc_id", "text")
    val full = Retrieval.bm25TopKOn(df, nQueries = 1, qLen = 4, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val pruned = Retrieval.bm25TopKPrunedOn(df, nQueries = 1, qLen = 4, k = 10,
        nInformative = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(full.contains(20L), "full bm25 should score the common-only doc")
    assert(!pruned.contains(20L), "pruned bm25 must not open a common-term-only doc")
    assert(!pruned.contains(23L) && !pruned.contains(24L))
    // every surviving candidate keeps its EXACT full-bm25 score
    for ((id, sc) <- pruned)
      assert(sc == full(id), s"doc $id: pruned $sc != full ${full(id)}")
    assert(pruned.keySet == Set(0L, 21L, 22L, 25L), s"candidates: ${pruned.keySet}")
    // ranks within the survivors follow the full ordering restricted
    // to them (scores are identical, so this is implied; spot-check
    // the winner)
    assert(pruned(0L) == full(0L))
  }

  test("a query's terms all appearing in one doc outranks partial matches") {
    import spark.implicits._
    // doc 10 has both rare terms once; 11/12 only one each, padded to
    // the same length with filler so the length normalization is equal
    val corpus = Seq(
      (0L, "alpha beta"),
      (10L, "alpha beta pad pad"),
      (11L, "alpha pad pad pad"),
      (12L, "beta pad pad pad"),
      (13L, "pad pad pad pad"))
    val got = Retrieval.bm25TopKOn(corpus.toDF("doc_id", "text"),
        nQueries = 1, qLen = 2, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(got.contains(10L) && got(10L) < got(11L) && got(10L) < got(12L),
      s"full match did not win: $got")
    assert(!got.contains(13L), "doc with no query term scored")
  }

  test("hybrid RRF equals a scalar recompute from the component ranks") {
    import org.apache.spark.sql.functions._
    val lex = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val sem = Similarity.bruteForceTopK(spark, dir, nQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    def round9(x: Double): Double =
      BigDecimal.decimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (lex.keySet ++ sem.keySet).map { k =>
      k -> round9(
        lex.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          sem.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
    }.toMap
    val got = Retrieval.hybridTopKRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty && got.keySet.subsetOf(want.keySet))
    for ((k, v) <- got) assert(v == want(k), s"$k: $v vs ${want(k)}")
    // fusion actually fuses: rank-1-in-both dominates rank-1-in-one
    assert(round9(2.0 / 61.0) > round9(1.0 / 61.0))
  }
}
