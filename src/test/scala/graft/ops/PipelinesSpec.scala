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

  test("contamination flags exactly the docs sharing an eval 5-gram") {
    // near-dups of eval docs (planted pairs have jac ≥ 0.9, so they
    // share plenty of 5-grams) must be flagged; report + survivors
    // must partition the non-eval corpus
    val flagged = Pipelines.contaminationReport(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val survivors = Pipelines.decontaminated(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val corpus = graft.Tables(spark, dir, "documents")
      .filter("doc_id >= 25").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty)
    assert((flagged & survivors).isEmpty && (flagged ++ survivors) == corpus)
    // every flagged doc genuinely shares a 5-gram with some eval doc
    val evalPairs = Dedup.jaccardPairs(spark, dir, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 25 && b >= 25 }.map(_._2).toSet
    assert(evalPairs.subsetOf(flagged),
      s"near-dups of eval docs not flagged: ${evalPairs -- flagged}")
  }

  test("repetition stats flag a degenerate repeated-token doc") {
    import org.apache.spark.sql.functions._
    val rep = TextAnalysis.repetitionStats(spark, dir)
    // real word-soup corpus: ratios in range, all rows emitted
    val rows = rep.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    }
    // keep == both raw ratios under the 0.2 thresholds (recomputed)
    val recheck = rep.filter(
      (col("top_tok_frac") <= 0.2 && col("dup_2gram_frac") <= 0.2) =!= col("keep"))
    // rounded-vs-raw can only disagree strictly ABOVE the threshold at
    // 4dp edge cases; assert none exist on this corpus
    assert(recheck.count() == 0)
  }

  test("packSequences lays docs on a contiguous token tape") {
    import org.apache.spark.sql.functions._
    val rows = Pipelines.packSequences(spark, dir, capacity = 512L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // contiguity: each doc's tape start = previous doc's start + tokens
    var tape = 0L
    for ((_, nt, seq, off) <- rows) {
      assert(seq == tape / 512 && off == tape % 512,
        s"tape position mismatch at tape=$tape")
      tape += nt
    }
    // max seq_id = the LAST doc's start window (its tail may straddle
    // into later windows — that is allowed by the chunking semantics,
    // so don't assert on the final token's window)
    val lastStart = tape - rows.last._2
    assert(rows.map(_._3).max == lastStart / 512)
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

  test("per-lang token budget: greedy-maximal within every language") {
    import org.apache.spark.sql.functions.col
    val rows = Pipelines.tokenBudgetPerLang(spark, dir, frac = 0.5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val all = TextAnalysis.withQuality(
        spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("lang"), col("text")))
      .select(col("lang"), col("doc_id"), col("quality_score"),
        col("n_tokens").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byLangAll = all.groupBy(_._1)
    for ((lang, rs) <- rows.groupBy(_._1)) {
      val budget = math.floor(byLangAll(lang).map(_._4).sum.toDouble * 0.5).toLong
      // within budget, cumulative sums consistent
      var run = 0L
      for ((_, _, _, nt, cum) <- rs.sortBy(_._5)) {
        run += nt; assert(cum == run && cum <= budget, s"$lang cum $cum budget $budget")
      }
      // greedy-maximal: the best unselected doc of this lang would not fit
      val selected = rs.map(_._2).toSet
      val next = byLangAll(lang).filter(d => !selected.contains(d._2))
        .sortBy(d => (-d._3, d._2)).headOption
      for ((_, _, _, nt) <- next) assert(run + nt > budget, s"$lang not maximal")
    }
  }

  test("quality ensemble = componentwise AND of its four signals") {
    import org.apache.spark.sql.functions.col
    val ens = Pipelines.qualityEnsemble(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(ens.nonEmpty)
    val q = TextAnalysis.qualityScores(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    val lang = TextAnalysis.langIdQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rep = TextAnalysis.repetitionStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val lm = TextAnalysis.lmSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((id, (qs, pl, tf, df, xb, keep)) <- ens) {
      assert(qs == q(id) && pl == lang(id) && (tf, df) == rep(id) && xb == lm(id),
        s"doc $id signals diverge from the standalone queries")
      val want = qs >= 0.35 && pl == "en" && tf <= 0.2 && df <= 0.2 && xb <= 4.93
      assert(keep == want, s"doc $id keep=$keep want=$want")
    }
    // the gate must actually split the corpus (non-vacuous)
    assert(ens.values.exists(_._6) && ens.values.exists(!_._6))
  }

  test("filter overlap matrix: symmetric, diagonal-dominant, partitions the signal universe") {
    val m = Pipelines.qualityFilterOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val names = Seq("quality", "lang", "repetition", "lm")
    assert(m.size == 18)
    for (a <- names; b <- names) {
      assert(m((a, b)) == m((b, a)), s"symmetry broken at ($a, $b)")
      assert(m((a, a)) >= m((a, b)), s"diagonal must dominate: ($a, $b)")
    }
    val anyK = m(("any", "any"))
    assert(names.forall(a => anyK >= m((a, a))), "any >= every diagonal")
    // the ensemble row shares the universe and the gates: kills = any,
    // survivors = none, and they partition the joined-doc universe
    val ens = Pipelines.qualityEnsemble(spark, dir).collect()
    assert(anyK == ens.count(!_.getBoolean(6)), "any == ensemble kills")
    assert(m(("none", "none")) == ens.count(_.getBoolean(6)), "none == keeps")
  }

  test("fuzzy decontamination: paraphrased eval material flags, light overlap scores but passes") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fuzzy").toString
    val evalDoc = (1 to 30).map(i => s"w$i").mkString(" ")
    // 100: one word swapped → ~0.8 shingle Jaccard (paraphrase) —
    // invisible to EXACT 5-gram decontamination beyond the edit point,
    // the case this operator exists for. 101: unrelated. 102: shares
    // one 5-word phrase → small nonzero score, below threshold.
    val para = evalDoc.split(" ").updated(14, "CHANGED").mkString(" ")
    val phrase = ((1 to 5).map(i => s"w$i") ++ (1 to 25).map(i => s"z$i")).mkString(" ")
    Seq((0L, evalDoc), (100L, para), (101L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (102L, phrase))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Pipelines.fuzzyDecontamVerdicts(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got(100L)._2 && got(100L)._1 > 0.7, s"paraphrase must flag: ${got(100L)}")
    assert(got(101L) == ((0.0, false)), s"unrelated: ${got(101L)}")
    assert(!got(102L)._2 && got(102L)._1 > 0.0 && got(102L)._1 < 0.2,
      s"light phrase overlap scores but passes: ${got(102L)}")
  }

  test("stage report: a monotone funnel consistent with the flagship output") {
    val rep = Pipelines.stageReport(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep.map(_._1).toSeq == (0 to 5) &&
      rep.map(_._2).toSeq == Seq("raw", "exact_dedup", "decontaminated",
        "quality_lang", "near_dedup", "token_budget"))
    val docs = rep.map(_._3)
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"doc counts must only shrink down the funnel: ${docs.toSeq}")
    assert(docs.last > 0 && docs.last < docs.head, "the funnel must actually cut")
    val finalRows = Pipelines.fullPrep(spark, dir).count()
    assert(docs.last == finalRows,
      s"stage 5 count ${docs.last} must equal the flagship row count $finalRows")
    val toks = rep.map(_._4)
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
  }

  test("next-fit packing: capacity respected, docs intact, partition-count invariant") {
    import org.apache.spark.sql.functions.col
    val capacity = 256L
    val bins = Pipelines.packBinsNextFit(spark, dir, capacity, 32).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.nonEmpty)
    // every bin respects the capacity unless it holds ONE oversized doc
    assert(bins.forall { case (_, _, nDocs, toks) => toks <= capacity || nDocs == 1 },
      "a multi-doc bin exceeded capacity")
    // docs and tokens are conserved: packing reorders, never drops
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bins.map(_._3).sum == docs.length, "doc count not conserved")
    assert(bins.map(_._4).sum == docs.map(_._2).sum, "token mass not conserved")
    // next-fit greediness: a bin only closed because the NEXT doc in
    // shard order would not fit — so no bin (except each shard's last)
    // could have absorbed its successor's first doc; spot-check via
    // the fill distribution being far above the degenerate 1-doc-a-bin
    val avgDocsPerBin = docs.length.toDouble / bins.length
    assert(avgDocsPerBin > 2.0, s"packing barely packs: $avgDocsPerBin docs/bin")
    // exact per-bin check on one shard against a local reference fold
    val shard0 = docs.filter(_._1 % 32 == 0).sortBy(_._1)
    var bin = -1L; var fill = 0L
    val refBins = scala.collection.mutable.Map[Long, (Long, Long)]()
    shard0.foreach { case (_, n) =>
      if (bin < 0 || fill + n > capacity) { bin += 1; fill = n } else fill += n
      val (c, t) = refBins.getOrElse(bin, (0L, 0L)); refBins(bin) = (c + 1, t + n)
    }
    val got0 = bins.filter(_._1 == 0).map(t => t._2 -> (t._3, t._4)).toMap
    assert(got0 == refBins.toMap, s"shard-0 bins diverge from the reference fold: $got0 vs $refBins")
    // input-partition-count invariance is swept by the driver-shaped
    // SPARK_GRAFT_CPUS=2 oracle run (the explicit repartition(shards)
    // pins the layout independent of session parallelism)
  }

  test("semantic packing: bins are cluster-pure with monotone coherence, docs conserved") {
    import org.apache.spark.sql.functions.col
    val capacity = 256L
    val bins = Pipelines.packBinsSemantic(spark, dir, capacity, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5)))
    assert(bins.nonEmpty)
    // capacity respected unless a bin holds one oversized doc
    assert(bins.forall { case (_, _, nDocs, toks, _) => toks <= capacity || nDocs == 1 })
    // conservation: every document packs exactly once (ids align 1:1
    // with embeddings in the fixture tables)
    val nDocs = graft.Tables(spark, dir, "documents").count()
    assert(bins.map(_._3).sum == nDocs, "doc count not conserved")
    // within a cluster, docs pack in non-increasing similarity order,
    // so an earlier bin's MEAN sim can never fall below a later bin's
    // (min of an earlier contiguous run >= max of a later one) — the
    // property that distinguishes semantic order from id order
    bins.groupBy(_._1).foreach { case (cl, rows) =>
      val ms = rows.sortBy(_._2).map(_._5)
      assert(ms.zip(ms.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"cluster $cl bin coherence not monotone: ${ms.mkString(",")}")
    }
    // the clusters are the shards: every centroid_id in the output is
    // one of the 8 hash-picked seed ids
    assert(bins.map(_._1).distinct.length <= 8)
  }
}
