package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the two round-7 kernels whose oracles use
  * a DIFFERENT formulation than the engine — the analytic equivalence
  * arguments pinned with generated evidence (driven as Spark batches,
  * one job per generated corpus, the ScrubPropertySpec pattern):
  *
  *  - [[graft.functions.CdcChunkHashes]] vs an independent scalar
  *    chunker: chunk sequences identical, lengths tile the document,
  *    min/max clamps hold.
  *  - [[TextAnalysis.bpeApplyMerge]] (the left-greedy FOLD) vs the
  *    oracle's POSITIONAL gaps-and-islands selection — including the
  *    self-pair (a,a) run overlap that makes the two formulations
  *    nontrivially equivalent.
  */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ----------------------------------------------------------- CDC

  /** Independent scalar reimplementation of the gear chunker. */
  private def refChunks(text: String, maskBits: Int, minLen: Int,
                        maxLen: Int): Seq[(Long, Long)] = {
    import graft.functions.TextExpressions.{fmix64, fold61}
    val cps = text.codePoints().toArray
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def emit(start: Int, len: Int): Unit = {
      var hh = 0L
      (0 until len).foreach(j => hh = fold61(hh, 5, cps(start + j).toLong))
      out += ((fmix64(hh), len.toLong))
    }
    var h = 0L
    var start = 0
    cps.indices.foreach { i =>
      h = (h << 1) + fmix64(cps(i).toLong)
      val clen = i + 1 - start
      if ((clen >= minLen && (h & mask) == 0L) || clen >= maxLen) {
        emit(start, clen); start = i + 1
      }
    }
    if (start < cps.length) emit(start, cps.length - start)
    out.toSeq
  }

  private val charGen = Gen.frequency(
    (8, Gen.alphaLowerChar), (2, Gen.oneOf(' ', '.', '0', 'Z')))
  private def textOf(seed: Long, n: Int): String =
    (0 until n).map { i =>
      charGen(Gen.Parameters.default, Seed(seed * 7919 + i)).getOrElse('x')
    }.mkString

  test("CDC kernel equals the scalar reference and tiles every document") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      // mix of lengths incl. shorter-than-minLen, exactly-maxLen, long
      val n = Seq(0, 3, 16, 255, 256, 257, 700, 1500)(i % 8) + i % 13
      (i.toLong, textOf(seed = 100 + i, n))
    }
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.textFunctions
        .cdc_chunk_hashes(col("text"), 6, 16, 256).as("cs"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(c => (c.getLong(0), c.getLong(1))))
      .toMap
    for ((id, text) <- docs) {
      val want = refChunks(text, 6, 16, 256)
      assert(got(id) == want, s"doc $id (${text.length} chars) diverges")
      val lens = want.map(_._2)
      assert(lens.sum == text.codePoints().count(),
        s"doc $id chunks must tile the text")
      if (lens.nonEmpty)
        assert(lens.init.forall(l => l >= 16 && l <= 256) && lens.last <= 256,
          s"doc $id clamp violation: $lens")
    }
  }

  // ----------------------------------------------------------- BPE

  /** The ORACLE's positional formulation: occurrence positions,
    * consecutive runs, odd rank within each run applied, absorbed
    * positions dropped, merged symbol substituted. */
  private def refApplyMerge(sy: Seq[String], ma: String, mb: String): Seq[String] = {
    val occ = sy.indices.dropRight(1).filter(i => sy(i) == ma && sy(i + 1) == mb)
    val applied = scala.collection.mutable.Set.empty[Int]
    var run = List.empty[Int]
    def flush(): Unit = {
      run.reverse.zipWithIndex.foreach { case (p, k) =>
        if (k % 2 == 0) applied += p
      }
      run = Nil
    }
    occ.foreach { p =>
      if (run.nonEmpty && p != run.head + 1) flush()
      run = p :: run
    }
    flush()
    sy.indices.flatMap { i =>
      if (applied(i)) Some(ma + mb)
      else if (i > 0 && applied(i - 1)) None
      else Some(sy(i))
    }
  }

  test("BPE merge fold equals the positional gaps-and-islands selection") {
    import spark.implicits._
    val sym = Gen.oneOf("a", "b", "c", "ab", "aa")
    val seqGen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, sym))
    val cases = (0 until 80).map { i =>
      val sy = seqGen(Gen.Parameters.default, Seed(31L * i + 5)).getOrElse(List("a"))
      (i.toLong, sy)
    }
    for ((ma, mb) <- Seq(("a", "b"), ("a", "a"), ("b", "c"), ("aa", "a"), ("a", "ab"))) {
      val got = cases.toDF("id", "sy")
        .select(col("id"), TextAnalysis.bpeApplyMerge(ma, mb).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      for ((id, sy) <- cases) {
        val want = refApplyMerge(sy, ma, mb)
        assert(got(id) == want,
          s"pair ($ma,$mb) on $sy: fold ${got(id)} vs positional $want")
      }
    }
  }
}
