package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline compositions — the queries a
  * 100 TB corpus-preparation job actually runs, assembled from the
  * operator library and still fully DuckDB-oracle-checked:
  *
  *  - [[cleanCorpus]]: exact-dedup → quality filter → language filter,
  *    all in ONE corpus scan plus one shuffle (the dedup window on the
  *    content hash); quality and lang-ID are per-row expressions that
  *    run only on dedup survivors.
  *  - [[neardupRemoval]]: canonical near-duplicate removal — drop every
  *    doc that appears as the non-canonical side (higher doc_id) of an
  *    n-gram-Jaccard near-dup pair, keeping the lowest-id exemplar of
  *    each near-dup cluster chain.
  *
  * Scale posture: cleanCorpus is scan + one hash shuffle + codegen'd
  * per-row kernels — the same shape at any corpus size. neardupRemoval
  * inherits [[Dedup.jaccardPairs]]' inverted-index plan (Σ bucket²,
  * never all-pairs) and subtracts the removal set with a broadcast-able
  * anti-join (the near-dup pair set is ≪ corpus by construction).
  */
object Pipelines {

  /** Exact-dedup (keep lowest doc_id per md5), then keep docs with
    * quality_score ≥ `minQuality` predicted as `lang`. */
  def cleanCorpus(s: SparkSession, dir: String,
                  minQuality: Double = 0.35, lang: String = "en"): DataFrame = {
    val byHash = Window.partitionBy(md5(col("text")))
    val survivors = Tables(s, dir, "documents")
      .withColumn("keep_id", min(col("doc_id")).over(byHash))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("text"))
    // one scan: quality + lang-ID are per-row column expressions over
    // the dedup survivors — no re-join, no second pass
    TextAnalysis.langId(TextAnalysis.withQuality(survivors))
      .filter(col("quality_score") >= minQuality && col("pred_lang") === lang)
      .select(col("doc_id"), col("pred_lang"), col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** PER-LANGUAGE token-budget selection: within each language, keep
    * the highest-quality documents until `frac` of that language's
    * token mass is reached — the grouped flavor of
    * [[tokenBudgetSelect]], and the primitive a mixture target is
    * enforced with ("at most half of each language's tokens, best
    * first"). Unlike the GLOBAL budget — which needs the two-phase
    * distributed prefix sum because a partition-less window collapses
    * to one task — the per-group cumulative sum is an ordinary window
    * PARTITIONED BY language: every group runs parallel, which is
    * exactly when the window primitive is the right tool. Budgets
    * derive from per-language totals (floor(frac·total), exact IEEE
    * over integer totals on both engines). */
  def tokenBudgetPerLang(s: SparkSession, dir: String,
                         frac: Double = 0.5): DataFrame = {
    // persist: the budgets aggregate AND the windowed scan both read
    // this frame — without it the quality lineage (split/stopword/
    // distinct HOFs over every doc) executes twice, the documented
    // dominant cost the global tokenBudgetSelect persists against
    // (cache lifetime: Dedup.boundedSharedCounts' contract)
    val scored = TextAnalysis.withQuality(
        Tables(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), col("quality_score"),
        col("n_tokens").cast("long").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val budgets = scored.groupBy(col("lang"))
      .agg(floor(sum(col("n_tokens")).cast("double") * frac).cast("long").as("budget"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(desc("quality_score"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(budgets), "lang")
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("lang"), col("doc_id"), col("quality_score"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"))
  }

  /** Pairwise kill-overlap of the [[qualityEnsemble]] gates — the
    * observability a filter stack is tuned with: a 4×4 matrix of
    * "documents killed by BOTH filter a and filter b" (the diagonal
    * = each filter's total kills), plus an `any`/`none` summary pair.
    * High off-diagonal overlap means a filter is redundant; a filter
    * whose diagonal ≈ its overlaps is adding nothing unique — the
    * standard ablation read before dropping or re-thresholding a
    * gate. Same signal lineages and document universe as the
    * ensemble row (inner joins: sub-2-token docs carry no signals).
    *
    * Plan: the four signal passes converge doc-keyed as in the
    * ensemble, then ONE aggregate computes all 18 counts (no
    * per-pair scans) and a `stack` unpivots the single row. */
  def qualityFilterOverlap(s: SparkSession, dir: String,
                           minQuality: Double = 0.35, lang: String = "en",
                           maxFrac: Double = 0.2, maxXent: Double = 4.93): DataFrame = {
    val base = Tables(s, dir, "documents")
    val sigs = TextAnalysis.langId(TextAnalysis.withQuality(base))
      .select(col("doc_id"), col("quality_score"), col("pred_lang"))
    val rep = TextAnalysis.repetitionStats(s, dir)
      .select(col("doc_id"), col("top_tok_frac"), col("dup_2gram_frac"))
    val lm = TextAnalysis.lmSurprisal(s, dir)
      .select(col("doc_id"), col("xent_bits"))
    val flags = sigs.join(rep, "doc_id").join(lm, "doc_id")
      .select(
        (col("quality_score") < minQuality).as("quality"),
        (col("pred_lang") =!= lang).as("lang"),
        (col("top_tok_frac") > maxFrac || col("dup_2gram_frac") > maxFrac)
          .as("repetition"),
        (col("xent_bits") > maxXent).as("lm"))
    val names = Seq("quality", "lang", "repetition", "lm")
    val anyKill = names.map(col).reduce(_ || _)
    val sums: Seq[org.apache.spark.sql.Column] =
      (for { a <- names; b <- names } yield
        sum(when(col(a) && col(b), 1L).otherwise(0L)).as(s"${a}__$b")) ++ Seq(
        sum(when(anyKill, 1L).otherwise(0L)).as("any__any"),
        sum(when(!anyKill, 1L).otherwise(0L)).as("none__none"))
    val stackArgs = (names.flatMap(a => names.map(b =>
      s"'$a', '$b', ${a}__$b")) ++
      Seq("'any', 'any', any__any", "'none', 'none', none__none")).mkString(", ")
    flags.agg(sums.head, sums.tail: _*)
      .selectExpr(
        s"stack(18, $stackArgs) AS (filter_a, filter_b, n_docs_killed)")
      .orderBy(col("filter_a"), col("filter_b"))
  }

  /** The multi-signal quality filter stack real curation pipelines
    * gate on — four independent per-doc signals joined on doc_id and
    * combined into one keep decision: heuristic quality score
    * (length/stopword/TTR mix), language ID, Gopher-style repetition
    * fractions, and unigram-LM cross-entropy. Every gate compares the
    * ROUNDED surfaced value (deterministic cross-engine by
    * construction); each signal is its own aggregation lineage, so the
    * plan is four parallel passes over the corpus converging in
    * doc_id-keyed joins — at scale these co-partition after the first
    * shuffle. Inner joins: documents below the signals' minimum sizes
    * (< 2 tokens) carry no repetition signal and are dropped — a real
    * stack prunes them anyway. */
  def qualityEnsemble(s: SparkSession, dir: String,
                      minQuality: Double = 0.35, lang: String = "en",
                      maxFrac: Double = 0.2, maxXent: Double = 4.93): DataFrame = {
    val base = Tables(s, dir, "documents")
    val sigs = TextAnalysis.langId(TextAnalysis.withQuality(base))
      .select(col("doc_id"), col("quality_score"), col("pred_lang"))
    val rep = TextAnalysis.repetitionStats(s, dir)
      .select(col("doc_id"), col("top_tok_frac"), col("dup_2gram_frac"))
    val lm = TextAnalysis.lmSurprisal(s, dir)
      .select(col("doc_id"), col("xent_bits"))
    sigs.join(rep, "doc_id").join(lm, "doc_id")
      .withColumn("keep",
        col("quality_score") >= minQuality && col("pred_lang") === lang &&
          col("top_tok_frac") <= maxFrac && col("dup_2gram_frac") <= maxFrac &&
          col("xent_bits") <= maxXent)
      .orderBy(col("doc_id"))
  }

  /** Survivors of near-duplicate removal: every doc except those
    * appearing as doc_b (the higher id) in a Jaccard ≥ 0.5 pair. */
  def neardupRemoval(s: SparkSession, dir: String): DataFrame = {
    val removed = Dedup.jaccardPairs(s, dir).select(col("doc_b").as("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"))
      .join(removed, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Two-phase distributed PREFIX SUM shared by [[tokenBudgetSelect]]
    * and [[packSequences]]: per-partition token totals (one bounded
    * collect of #partitions longs) become broadcast offsets, then each
    * partition streams its own running sum — never a partition-less
    * window (which collapses all rows to a single task).
    *
    * `sorted` MUST already be range-partitioned + within-partition
    * sorted AND persisted by the caller: the totals pass and the emit
    * pass are two separate actions, and an un-cached
    * `repartitionByRange` would re-SAMPLE its range boundaries between
    * them, de-synchronizing the offsets. That persist backs the
    * returned lazy frame, so it cannot be released here — callers are
    * sessions that clearCache between queries (Verify/Bench) or accept
    * one cached frame per call (same documented contract as
    * [[graft.ops.Ivf.ivfQuery]]). `emit` receives each element with
    * the running total INCLUDING that element's tokens. */
  private[ops] def withRunningTotal[T, R](sorted: Dataset[T])(tokenOf: T => Long)(
      emit: (T, Long) => R)(implicit enc: org.apache.spark.sql.Encoder[R]): Dataset[R] = {
    val s = sorted.sparkSession
    import s.implicits._
    val partTotals = sorted.mapPartitions { it =>
      Iterator((org.apache.spark.TaskContext.getPartitionId(),
        it.map(tokenOf).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bOff = s.sparkContext.broadcast(offsets)
    sorted.mapPartitions { it =>
      var run = bOff.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { t => run += tokenOf(t); emit(t, run) }
    }
  }

  /** Fill a token budget with the highest-quality documents: total
    * order (quality desc, doc_id), keep rows while the running token
    * total stays within `budget`. Deterministic and oracle-checkable
    * at any scale via [[withRunningTotal]]. */
  def tokenBudgetSelect(s: SparkSession, dir: String,
                        budget: Long = 20000L): DataFrame = {
    import s.implicits._
    val scored = TextAnalysis.withQuality(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("quality_score"),
        col("n_tokens").cast("long").as("n_tokens"))
      .as[(Long, Double, Long)]
    val nParts = s.sessionState.conf.numShufflePartitions
    val sorted = scored
      .repartitionByRange(nParts, desc("quality_score"), col("doc_id"))
      .sortWithinPartitions(desc("quality_score"), col("doc_id"))
      .as[(Long, Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withRunningTotal(sorted)(_._3) { case ((id, q, nt), run) => (id, q, nt, run) }
      .toDF("doc_id", "quality_score", "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .orderBy(col("cum_tokens"))
  }

  /** Sequence packing — the concat-then-chunk layout LLM training
    * actually uses: documents in deterministic (doc_id) order are laid
    * end-to-end on a token tape, and each gets the context-window
    * slot(s) its token range falls into: seq_id = start DIV capacity,
    * offset_in_seq = start MOD capacity (a doc may straddle two
    * windows, exactly as a chunked token stream does).
    *
    * Tape positions come from the shared [[withRunningTotal]] prefix
    * sum — no partition-less window, deterministic at any scale. A
    * NULL text counts 0 tokens (coalesce) rather than poisoning the
    * non-nullable encoder, matching the oracle's NULL-skipping sum. */
  def packSequences(s: SparkSession, dir: String,
                    capacity: Long = 2048L): DataFrame = {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)).as("n_tokens"))
      .as[(Long, Long)]
    val nParts = s.sessionState.conf.numShufflePartitions
    val sorted = toks
      .repartitionByRange(nParts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withRunningTotal(sorted)(_._2) { case ((id, nt), run) =>
      val s0 = run - nt
      (id, nt, s0 / capacity, s0 % capacity)
    }.toDF("doc_id", "n_tokens", "seq_id", "offset_in_seq")
      .orderBy(col("doc_id"))
  }

  /** The FLAGSHIP end-to-end corpus preparation run — every stage a
    * 100 TB pipeline actually chains, in production order, one
    * composed lazy plan (Catalyst sees the whole thing):
    *
    *   1. exact dedup (keep lowest doc_id per md5)
    *   2. benchmark decontamination (drop docs sharing a word 5-gram
    *      with the eval set = raw doc_id < `evalMax`)
    *   3. quality + language gate (per-row kernels)
    *   4. near-dup removal (Jaccard pairs computed OVER THE SURVIVOR
    *      SET — inverted-index join on hashed shingles; drop doc_b)
    *   5. token-budget selection (highest quality first, distributed
    *      prefix sum, keep while cum_tokens ≤ `budget`)
    *
    * Stage order matters at scale and is the documented one: exact
    * dedup runs before the near-dup stage so identical texts cannot
    * flood posting buckets, and the cheap per-row gates run before
    * the pair join so it sees the smallest possible corpus. Fully
    * DuckDB-oracle-checked end to end (the oracle composes the same
    * five stages; the Jaccard chain nests in its own WITH so its CTE
    * names cannot collide with the composition's). */
  def fullPrep(s: SparkSession, dir: String, evalMax: Long = 25L,
               n: Int = 5, minQuality: Double = 0.35, lang: String = "en",
               budget: Long = 5000L): DataFrame = {
    val f = prepFrames(s, dir, evalMax, n, minQuality, lang)
    budgetSelect(s, f.survivors, budget)
      .orderBy(col("cum_tokens"))
  }

  /** The prep chain's intermediate frames, one per stage —
    * [[fullPrep]] consumes the tail, [[stageReport]] counts every
    * stage. One source of truth for the stage order and semantics. */
  private final case class PrepFrames(
      raw: DataFrame,          // documents (doc_id, text)
      exactDedup: DataFrame,   // stage 1 survivors (doc_id, text)
      decontaminated: DataFrame, // stage 2 (holdout excluded + gram-clean)
      qualityLang: DataFrame,  // stage 3 (doc_id, text, quality_score, n_tokens)
      survivors: DataFrame)    // stage 4 (doc_id, quality_score, n_tokens)

  private def prepFrames(s: SparkSession, dir: String, evalMax: Long,
                         n: Int, minQuality: Double, lang: String): PrepFrames = {
    val d = Tables(s, dir, "documents")
    val byHash = Window.partitionBy(md5(col("text")))
    val dedup = d
      .withColumn("keep_id", min(col("doc_id")).over(byHash))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("text"))
    val evalGrams = grams(d.filter(col("doc_id") < evalMax), n)
      .select(col("g")).distinct()
    val corpusSide = dedup.filter(col("doc_id") >= evalMax)
    val contaminated = grams(corpusSide, n)
      .join(broadcast(evalGrams), Seq("g"))
      .select(col("doc_id")).distinct()
    val clean = corpusSide.join(contaminated, Seq("doc_id"), "left_anti")
    val scored = TextAnalysis.langId(TextAnalysis.withQuality(clean))
      .filter(col("quality_score") >= minQuality && col("pred_lang") === lang)
      .select(col("doc_id"), col("text"), col("quality_score"),
        col("n_tokens").cast("long").as("n_tokens"))
    val removedB = Dedup.jaccardPairsOn(scored.select(col("doc_id"), col("text")))
      .select(col("doc_b").as("doc_id")).distinct()
    val surv = scored.join(removedB, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))
    PrepFrames(d, dedup, clean, scored, surv)
  }

  /** Quality-first token-budget selection over a (doc_id,
    * quality_score, n_tokens) survivor frame — the distributed prefix
    * sum + cap filter, shared by [[fullPrep]] and [[stageReport]]. */
  private def budgetSelect(s: SparkSession, surv: DataFrame,
                           budget: Long): DataFrame = {
    import s.implicits._
    val nParts = s.sessionState.conf.numShufflePartitions
    val sorted = surv.as[(Long, Double, Long)]
      .repartitionByRange(nParts, desc("quality_score"), col("doc_id"))
      .sortWithinPartitions(desc("quality_score"), col("doc_id"))
      .as[(Long, Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withRunningTotal(sorted)(_._3) { case ((id, q, nt), run) => (id, q, nt, run) }
      .toDF("doc_id", "quality_score", "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
  }

  /** Pipeline OBSERVABILITY: document and token counts surviving each
    * stage of the [[fullPrep]] funnel — the per-stage yield report a
    * production curation run publishes (where did the corpus go, which
    * gate is the aggressive one). Shares the chain with the flagship
    * row, so the report cannot drift from what the pipeline actually
    * does; every stage frame is persisted so each prefix executes
    * once, and the per-stage counts are single-row aggregates. Token
    * counts before the quality stage use the same whitespace
    * tokenization the later stages carry. */
  def stageReport(s: SparkSession, dir: String, evalMax: Long = 25L,
                  n: Int = 5, minQuality: Double = 0.35, lang: String = "en",
                  budget: Long = 5000L): DataFrame = {
    import s.implicits._
    val f = prepFrames(s, dir, evalMax, n, minQuality, lang)
    def toks(df: DataFrame): DataFrame = df.select(col("doc_id"),
      coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)).as("n_tokens"))
    val stages: Seq[(Int, String, DataFrame)] = {
      val s1 = f.exactDedup.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s2 = f.decontaminated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s3 = f.qualityLang.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s4 = f.survivors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Seq(
        (0, "raw", toks(f.raw)),
        (1, "exact_dedup", toks(s1)),
        (2, "decontaminated", toks(s2)),
        (3, "quality_lang", s3.select(col("doc_id"), col("n_tokens"))),
        (4, "near_dedup", s4.select(col("doc_id"), col("n_tokens"))),
        (5, "token_budget",
          budgetSelect(s, s4, budget).select(col("doc_id"), col("n_tokens"))))
    }
    stages.map { case (i, name, df) =>
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(i).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    }.reduce(_ unionAll _)
      .orderBy(col("stage_id"))
  }

  /** Deterministic global TRAINING-ORDER SHUFFLE: documents are
    * totally ordered by (m61_fmix_hash63(doc_id), doc_id) — a
    * reproducible pseudo-random permutation, no RNG state — and each
    * gets its 1-based position on that order. The position comes from
    * the same two-phase distributed rank as the prefix sums
    * ([[withRunningTotal]] with weight 1): range-partition by the
    * hash (sampled boundaries), per-partition counts become broadcast
    * offsets — NEVER a partition-less `row_number()` window, which
    * would funnel the corpus through one task. This is the shuffle a
    * training dataloader consumes at 100 TB: one range-exchange, and
    * the output is already range-partitioned by shard position for a
    * direct partitioned write. */
  def shuffleOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.textFunctions.m61_fmix_hash63(col("doc_id")).as("hk"))
      .as[(Long, Long)]
    val nParts = s.sessionState.conf.numShufflePartitions
    val sorted = hashed
      .repartitionByRange(nParts, col("hk"), col("doc_id"))
      .sortWithinPartitions(col("hk"), col("doc_id"))
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withRunningTotal(sorted)(_ => 1L) { case ((id, _), run) => (run, id) }
      .toDF("ord", "doc_id")
      .orderBy(col("ord"))
  }

  /** Quality-aware near-duplicate collapse: inside every near-dup
    * CLUSTER (connected components of the Jaccard pair graph) keep
    * the HIGHEST-quality document (ties → lowest doc_id) instead of
    * [[neardupRemoval]]'s lowest-id policy — the keep-policy real
    * curation runs use, since near-dup groups usually contain one
    * clean original and N degraded copies. Unclustered documents
    * survive unchanged with n_merged = 1.
    *
    * Plan shape: the cluster label table is ≪ corpus (pair-graph
    * nodes only), so the quality join and the per-cluster argmax
    * window both run on that small frame; the corpus-side work is
    * one scan for quality scores and one anti-join. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame =
    keepBestFrom(s, dir, Dedup.neardupClusters(s, dir))

  /** [[dedupKeepBest]] over the MULTI-SIGNAL cluster graph
    * ([[Dedup.multiSignalClusters]]) — the complete dedup endgame:
    * four candidate generators (Jaccard, SimHash, semantic, CDC
    * chunk coverage) merge into one component pass, then
    * one exemplar (highest quality, id tie-break) survives per
    * cluster. Same keep policy, richer evidence. */
  def multiSignalKeepBest(s: SparkSession, dir: String): DataFrame =
    keepBestFrom(s, dir, Dedup.multiSignalClusters(s, dir))

  /** Keep policy shared by both flavors: per-cluster argmax on
    * quality over any (doc_id, cluster_id) labeling, loners pass
    * through with n_merged = 1. The window runs on the cluster label
    * table (≪ corpus). */
  private def keepBestFrom(s: SparkSession, dir: String,
                           clusters: DataFrame): DataFrame = {
    val q = TextAnalysis.withQuality(
        Tables(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("quality_score"))
    val byCluster = Window.partitionBy(col("cluster_id"))
    val ranked = clusters.join(q, Seq("doc_id"))
      .withColumn("n_merged", count(lit(1)).over(byCluster))
      .withColumn("rn", row_number().over(
        byCluster.orderBy(desc("quality_score"), col("doc_id"))))
    val best = ranked.filter(col("rn") === 1)
      .select(col("doc_id"), col("quality_score"), col("n_merged"))
    val loners = q.join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality_score"), lit(1L).as("n_merged"))
    best.unionByName(loners).orderBy(col("doc_id"))
  }

  /** Keep-best tail over an upstream `labels` CTE (q/cl/rk + final
    * SELECT incl. the loner union) — shared by both keep-best oracle
    * flavors so the keep policy has one SQL source. */
  private lazy val keepBestTailSql: String =
    s"""q AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS quality_score FROM documents),
       |cl AS (SELECT lb.doc_id, lb.cluster_id, q.quality_score
       |       FROM labels lb JOIN q USING (doc_id)),
       |rk AS (SELECT doc_id, quality_score,
       |         row_number() OVER (PARTITION BY cluster_id
       |           ORDER BY quality_score DESC, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY cluster_id) AS n_merged
       |       FROM cl)
       |SELECT doc_id, quality_score, CAST(n_merged AS BIGINT) AS n_merged
       |FROM rk WHERE rn = 1
       |UNION ALL
       |SELECT doc_id, quality_score, CAST(1 AS BIGINT) AS n_merged
       |FROM q WHERE doc_id NOT IN (SELECT doc_id FROM labels)
       |ORDER BY doc_id""".stripMargin

  /** [[contaminationReport]] with a BLOOM-FILTER prefilter — the
    * compact form the broadcast degrades to when the eval gram set is
    * too large to broadcast as a hash relation: build a distributed
    * BloomFilter over the eval grams (`treeAggregate`; the driver
    * holds only the filter's bits — ~1.2 GB per 10⁹ grams at this
    * fpp, vs 10–100× that for the materialized gram strings), drop
    * ~all corpus grams against it in the scan stage, then EXACT-join
    * only the survivors. The confirm join removes every false
    * positive, so the output is bit-identical to the exact operator —
    * deterministically, not probabilistically — and shares its
    * oracle; fpp only tunes how much of the corpus reaches the join.
    * The membership probe is a broadcast closure (sketch probes have
    * no public codegen Expression), applied after the gram explode —
    * the scan/explode stages stay whole-stage codegen. */
  def contaminationBloom(s: SparkSession, dir: String,
                         n: Int = 5, evalMax: Long = 25L,
                         fpp: Double = 1e-6): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val evalGrams = grams(d.filter(col("doc_id") < evalMax), n)
      .select(col("g")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = evalGrams.stat.bloomFilter("g", math.max(evalGrams.count(), 1L), fpp)
    val bfB = s.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => g != null && bfB.value.mightContainString(g))
    grams(d.filter(col("doc_id") >= evalMax), n)
      .filter(mightContain(col("g")))
      .join(broadcast(evalGrams), Seq("g")) // exact confirm: kills FPs
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, g) posting frame of distinct word `n`-grams (native
    * [[graft.functions.WordNGrams]] kernel — the HOF transform stack
    * it replaces paid an interpreted lambda per element × pass). */
  private def grams(df: DataFrame, n: Int): DataFrame =
    df.withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"),
        explode(graft.functions.textFunctions.word_ngrams(col("t"), n)).as("g"))

  /** Benchmark decontamination: flag corpus documents sharing any word
    * `n`-gram with the eval set (here: doc_id < `evalMax` stands in
    * for the benchmark; a real deployment passes its eval corpus).
    * The standard pre-training hygiene pass (GPT-3 App. C shape).
    *
    * Plan: the EVAL side's distinct grams are the small side by
    * construction (benchmarks are tiny next to a 100 TB corpus), so
    * the candidate join is `corpus grams ⋈ broadcast(eval grams)` —
    * an inverted index keyed by the eval set, never a cross join, and
    * the corpus side stays one scan + one map-side-combining groupBy. */
  def contaminationReport(s: SparkSession, dir: String,
                          n: Int = 5, evalMax: Long = 25L): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val evalGrams = grams(d.filter(col("doc_id") < evalMax), n)
      .select(col("g")).distinct()
    grams(d.filter(col("doc_id") >= evalMax), n)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("doc_id"))
  }

  /** Corpus minus contaminated docs — the anti-join consumer of
    * [[contaminationReport]] (the removal set is ≪ corpus). */
  /** FUZZY benchmark decontamination — the near-duplicate upgrade of
    * the exact 5-gram rows: a corpus document is contaminated when its
    * shingle-set Jaccard against ANY eval-set document reaches
    * `threshold`, catching lightly paraphrased or partially copied
    * eval material that exact n-gram overlap misses below its length.
    * Emits a per-corpus-document verdict (max Jaccard against the
    * eval set, 0 when no shingle is shared; contaminated flag) — the
    * audit table a benchmark-hygiene review reads, not just the
    * survivor list.
    *
    * Scale posture: the EVAL side is bounded (it is the benchmark),
    * so its hashed shingle postings broadcast — the corpus pays one
    * scan + one broadcast join + a per-(corpus, eval) count, exactly
    * the exact-decontamination shape with scores instead of a
    * membership bit; no corpus self-join anywhere. Jaccard compares on
    * raw IEEE doubles from identical integer inputs (the jaccardPairs
    * contract); the surfaced max is 4dp-rounded. */
  def fuzzyDecontamVerdicts(s: SparkSession, dir: String, evalMax: Long = 25L,
                            threshold: Double = 0.5): DataFrame = {
    val withH = Dedup.shingledOn(Tables(s, dir, "documents"))
      .select(col("doc_id"),
        graft.functions.textFunctions.m61_token_hashes(col("shingles")).as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
    val post = withH.select(col("doc_id"), col("sz"), explode(col("hs")).as("g"))
    val evalP = post.filter(col("doc_id") < evalMax)
      .select(col("doc_id").as("e_doc"), col("sz").as("e_sz"), col("g"))
    val scored = post.filter(col("doc_id") >= evalMax)
      .join(broadcast(evalP), Seq("g"))
      .groupBy(col("doc_id"), col("sz"), col("e_doc"), col("e_sz"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("jac",
        col("n_shared").cast("double") / (col("sz") + col("e_sz") - col("n_shared")))
    val verdict = scored.groupBy(col("doc_id")).agg(max(col("jac")).as("mj"))
    withH.filter(col("doc_id") >= evalMax).select(col("doc_id"))
      .join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("mj"), lit(0.0)), 4).as("max_eval_jac"),
        (coalesce(col("mj"), lit(0.0)) >= threshold).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  def decontaminated(s: SparkSession, dir: String,
                     n: Int = 5, evalMax: Long = 25L): DataFrame =
    Tables(s, dir, "documents")
      .filter(col("doc_id") >= evalMax)
      .select(col("doc_id"))
      .join(contaminationReport(s, dir, n, evalMax).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))

  /** Shared decontamination CTE bodies (no WITH): per-doc distinct
    * 5-gram postings and the eval side's gram set. */
  private lazy val contamCte: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 4),
      |        i -> array_to_string(list_slice(t, i + 1, i + 5), ' ')))) AS g
      |      FROM tok WHERE len(t) >= 5),
      |eg AS (SELECT DISTINCT g FROM g WHERE doc_id < 25)""".stripMargin

  /** The full_prep oracle's stage chain (no leading WITH), ending in
    * `ranked` — shared by the flagship row and the stage report so
    * the two cannot diverge. Stage CTEs: keep (exact dedup), surv0
    * (holdout excluded), eg/cg/bad (5-gram decontamination), surv1,
    * q/pl (quality + langid), surv2, pairs/surv3 (near-dup removal),
    * ranked (quality-first prefix sum). */
  private lazy val fullPrepCtes: String =
    s"""keep AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS k
       |    FROM documents) WHERE doc_id = k),
       |surv0 AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)
       |          WHERE d.doc_id >= 25),
       |etok AS (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id < 25),
       |eg AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(len(t) - 4),
       |         i -> array_to_string(list_slice(t, i + 1, i + 5), ' ')))) AS g
       |       FROM etok WHERE len(t) >= 5),
       |ctok AS (SELECT doc_id, string_split(text, ' ') AS t FROM surv0),
       |cg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - 4),
       |         i -> array_to_string(list_slice(t, i + 1, i + 5), ' ')))) AS g
       |       FROM ctok WHERE len(t) >= 5),
       |bad AS (SELECT DISTINCT c.doc_id FROM cg c JOIN eg USING (g)),
       |surv1 AS (SELECT * FROM surv0 WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
       |q AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS quality_score,
       |        len(string_split(text, ' ')) AS n_tokens
       |      FROM documents),
       |${TextAnalysis.langBestCte},
       |pl AS (${TextAnalysis.predLangSelect}),
       |surv2 AS (SELECT s.doc_id, s.text, q.quality_score, q.n_tokens
       |          FROM surv1 s JOIN q ON s.doc_id = q.doc_id
       |                       JOIN pl ON s.doc_id = pl.doc_id
       |          WHERE q.quality_score >= 0.35 AND pl.pred_lang = 'en'),
       |pairs AS (${Dedup.boundedJaccardSqlFrom("surv2")}),
       |surv3 AS (SELECT doc_id, quality_score, n_tokens FROM surv2
       |          WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
       |ranked AS (SELECT doc_id, quality_score, n_tokens,
       |             CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |           FROM surv3)""".stripMargin

  /** BOUNDARY-PRESERVING sequence packing — the other standard
    * packing discipline beside [[packSequences]]' concat-then-chunk
    * tape: no document ever straddles a training sequence (chunking
    * splits attention context mid-document; next-fit trades PADDING
    * for intact documents, and the fill percentage this row surfaces
    * is exactly the GPU time that tradeoff costs). NEXT-FIT bin
    * packing per hash shard: documents are sharded by
    * `doc_id mod shards`, ordered by doc_id within the shard, and
    * appended to the current bin until the next document would
    * overflow `capacity`, which closes it (a document larger than the
    * capacity occupies a bin alone — truncation/splitting is a
    * separate concern). Scale posture: next-fit is inherently a
    * sequential fold, so it runs as ONE `mapPartitions` pass with
    * O(1) state over shard-repartitioned, shard-sorted rows — the
    * shard count (not the corpus) bounds the sequential span, exactly
    * how a production pipeline packs per output shard; this is the
    * justified-mapPartitions case (the bin boundary depends on every
    * prior decision, so no window expresses it). Output: one row per
    * (shard, bin) with doc/token counts and fill percentage —
    * deterministic, partition-count invariant (the repartition pins
    * the layout), oracle-mirrored by a per-shard recursive-CTE fold. */
  def packBinsNextFit(s: SparkSession, dir: String,
                      capacity: Long = 256L, shards: Int = 32): DataFrame =
    packFold(
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
      capacity, shards)

  /** [[packBinsNextFit]] with bins filled by LEARNED-TOKENIZER lengths
    * instead of whitespace counts — the discipline a real pipeline
    * runs, since GPU sequence budgets are BPE tokens, not words: the
    * same 6-step BPE vocabulary `bpe_tokenize_stats` learns scores
    * each document ([[TextAnalysis.bpeDocTokenCounts]] — one
    * word-count shuffle, counts broadcast back to the corpus), and
    * those counts feed the identical next-fit fold. Capacity defaults
    * 4× the whitespace row's: at ~6 merge steps a word is still ~4
    * BPE tokens, so 1024 keeps the same few-docs-per-bin shape.
    * Oracle: the BPE-apply CTE chain feeds the recursive pack CTE —
    * the two independent formulations compose exactly like the code. */
  def packBinsNextFitBpe(s: SparkSession, dir: String,
                         capacity: Long = 1024L, shards: Int = 32,
                         steps: Int = 6): DataFrame =
    packFold(
      TextAnalysis.bpeDocTokenCounts(Tables(s, dir, "documents"), steps),
      capacity, shards)

  /** IN-CONTEXT-PRETRAINING-style SEMANTIC packing (the Shi et al.
    * 2024 discipline: a training sequence should hold RELATED
    * documents, not an arbitrary id-order slice — retrieval-shaped
    * context teaches long-range use of it). Deterministic shape:
    * documents cluster by their embeddings through the hash-seeded
    * nearest-centroid assignment (`embedding_cluster_assign`'s
    * [[Similarity.clusterAssignOn]] — no RNG, oracle-checkable), and
    * each cluster packs next-fit in (similarity-to-centroid DESC,
    * doc_id) order, so every bin is a semantically coherent run from
    * one cluster; `mean_sim` per bin surfaces the coherence the
    * discipline exists to buy (id-order packing mixes clusters
    * arbitrarily). The CLUSTER is the shard: the fold repartitions on
    * `centroid_id`, so packing never crosses clusters.
    *
    * Scale posture: one embeddings pass against k broadcast seeds
    * (the clusterAssign plan), one broadcast-size join of counts to
    * assignments, then the same ONE-mapPartitions O(1)-state fold as
    * [[packBinsNextFit]] — the justified-mapPartitions case. The
    * sequential span per task is the CLUSTER, so k must grow with n
    * (cells of ~constant size — exactly how semanticDedup/IVF size
    * their cell counts; the ICLM recipe likewise bounds cluster size
    * before its within-cluster ordering pass). */
  def packBinsSemantic(s: SparkSession, dir: String,
                       capacity: Long = 256L, k: Int = 8): DataFrame = {
    val packed = packDocsSemantic(s, dir, capacity, k)
    packed.groupBy(col("cluster"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        // decimal staging: the 6dp-rounded sims are cross-engine equal,
        // so an exact decimal sum is order-insensitive where a double
        // sum would depend on partition order
        sum(col("sim").cast("decimal(10,6)")).as("simsum"))
      .withColumn("fill_pct", round(col("bin_tokens") * 100.0 / capacity, 2))
      .withColumn("mean_sim",
        round(col("simsum").cast("double") / col("n_docs"), 6))
      .select(col("cluster"), col("bin"), col("n_docs"), col("bin_tokens"),
        col("fill_pct"), col("mean_sim"))
      .orderBy(col("cluster"), col("bin"))
  }

  /** [[packBinsSemantic]]'s per-document assignment frame
    * (cluster, bin, doc_id, n_tokens, sim) — the fold itself, shared
    * with [[packReport]]'s coherence metric. */
  private[ops] def packDocsSemantic(s: SparkSession, dir: String,
                                    capacity: Long, k: Int): DataFrame = {
    import s.implicits._
    val counts = Tables(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val assigned = Similarity.clusterAssignOn(
        Similarity.emb(s, dir).select(col("vec_id"), col("v")), k)
      .select(col("vec_id").as("doc_id"), col("centroid_id"), col("sim"))
    val arranged = counts.join(assigned, Seq("doc_id"))
      .repartition(k, col("centroid_id"))
      // ordering uses the ROUNDED sim (what clusterAssignOn emits), so
      // Spark and the oracle break near-ties identically; doc_id is
      // the total tiebreak
      .sortWithinPartitions(col("centroid_id"), desc("sim"), col("doc_id"))
      .select(col("centroid_id"), col("sim"), col("doc_id"), col("n_tokens"))
      .as[(Long, Double, Long, Long)]
    arranged.mapPartitions { it =>
      // several clusters can hash to one partition; the fold resets at
      // each cluster boundary (rows arrive cluster-sorted). Centroid
      // ids are vec_ids >= 0, so MinValue is a safe sentinel.
      var cur = Long.MinValue
      var bin = -1L
      var fill = 0L
      it.map { case (cl, sim, docId, nTok) =>
        if (cl != cur) { cur = cl; bin = -1L; fill = 0L }
        if (bin < 0L || fill + nTok > capacity) { bin += 1L; fill = nTok }
        else fill += nTok
        (cl, bin, docId, nTok, sim)
      }
    }.toDF("cluster", "bin", "doc_id", "n_tokens", "sim")
  }

  /** The semantic per-doc pack fold as CTEs (sdocs, srec), expecting
    * `wcnt` (doc_id, n_tokens) and `casg` (the cluster assignment) in
    * scope — shared by [[packBinsSemanticSql]] and the pack-report
    * oracle. */
  private def packSemanticDocCtes(capacity: Long): String =
    s"""sdocs AS (
       |  SELECT w.doc_id, a.centroid_id AS cluster, a.sim, w.n_tokens,
       |         row_number() OVER (PARTITION BY a.centroid_id
       |                            ORDER BY a.sim DESC, w.doc_id) AS rn
       |  FROM wcnt w JOIN casg a ON w.doc_id = a.vec_id),
       |srec AS (
       |  SELECT cluster, doc_id, n_tokens, sim, rn, CAST(0 AS BIGINT) AS bin,
       |         n_tokens AS fill
       |  FROM sdocs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.cluster, d.doc_id, d.n_tokens, d.sim, d.rn,
       |         CASE WHEN r.fill + d.n_tokens > $capacity THEN r.bin + 1 ELSE r.bin END,
       |         CASE WHEN r.fill + d.n_tokens > $capacity THEN d.n_tokens
       |              ELSE r.fill + d.n_tokens END
       |  FROM srec r JOIN sdocs d ON d.cluster = r.cluster AND d.rn = r.rn + 1)""".stripMargin

  /** Oracle for [[packBinsSemantic]]: the cluster-assignment CTEs feed
    * a per-cluster recursive next-fit CTE ordered by (sim DESC,
    * doc_id). */
  private def packBinsSemanticSql(capacity: Long, k: Int): String =
    s"""WITH RECURSIVE ${Similarity.clusterAssignSimCtes(k)},
       |wcnt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |         FROM documents),
       |${packSemanticDocCtes(capacity)}
       |SELECT cluster, bin, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       |       ROUND(sum(n_tokens) * 100.0 / $capacity, 2) AS fill_pct,
       |       ${graft.OracleSql.round(
               "CAST(sum(CAST(sim AS DECIMAL(10,6))) AS DOUBLE) / count(*)", 6)} AS mean_sim
       |FROM srec GROUP BY cluster, bin ORDER BY cluster, bin""".stripMargin

  /** The shared next-fit fold over any (doc_id, n_tokens) frame as a
    * PER-DOCUMENT frame (shard, bin, doc_id, n_tokens) — see
    * [[packBinsNextFit]] for the packing semantics and scale posture;
    * shared by [[packFold]]'s per-bin roll-up and [[packReport]]'s
    * coherence metric. */
  private[ops] def packDocsNextFit(counts: DataFrame, capacity: Long,
                                   shards: Int): DataFrame = {
    import counts.sparkSession.implicits._
    val docs = counts
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)).cast("int"))
    val arranged = docs.repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .select(col("shard"), col("doc_id"), col("n_tokens"))
      .as[(Int, Long, Long)]
    arranged.mapPartitions { it =>
      // several shard values can hash to one partition; the fold
      // resets at each shard boundary (rows arrive shard-sorted)
      var curShard = Int.MinValue
      var bin = -1L
      var fill = 0L
      it.map { case (shard, docId, nTok) =>
        if (shard != curShard) { curShard = shard; bin = -1L; fill = 0L }
        if (bin < 0L || fill + nTok > capacity) { bin += 1L; fill = nTok }
        else fill += nTok
        (shard, bin, docId, nTok)
      }
    }.toDF("shard", "bin", "doc_id", "n_tokens")
  }

  private def packFold(counts: DataFrame, capacity: Long,
                       shards: Int): DataFrame = {
    val packed = packDocsNextFit(counts, capacity, shards)
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"))
      .withColumn("fill_pct",
        round(col("bin_tokens") * 100.0 / capacity, 2))
      .orderBy(col("shard"), col("bin"))
  }

  /** The next-fit fold as a per-shard recursive CTE stepping one
    * document (row_number within shard) per iteration — `shards` rows
    * per step, `max docs/shard` steps. `srcCte` must expose
    * (doc_id, n_tokens); `p` prefixes the CTE names so two folds can
    * coexist in one oracle (the pack report runs the whitespace and
    * BPE folds side by side). Ends in `${p}rec`, the per-doc
    * assignment. */
  private def packFoldCtes(srcCte: String, capacity: Long, shards: Int,
                           p: String = ""): String =
    s"""${p}docs AS (
       |  SELECT doc_id,
       |         CAST(doc_id % $shards AS INT) AS shard,
       |         n_tokens,
       |         row_number() OVER (PARTITION BY doc_id % $shards ORDER BY doc_id) AS rn
       |  FROM $srcCte),
       |${p}rec AS (
       |  SELECT shard, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin,
       |         n_tokens AS fill
       |  FROM ${p}docs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.doc_id, d.n_tokens, d.rn,
       |         CASE WHEN r.fill + d.n_tokens > $capacity THEN r.bin + 1 ELSE r.bin END,
       |         CASE WHEN r.fill + d.n_tokens > $capacity THEN d.n_tokens
       |              ELSE r.fill + d.n_tokens END
       |  FROM ${p}rec r JOIN ${p}docs d ON d.shard = r.shard AND d.rn = r.rn + 1)""".stripMargin

  private def packFoldSql(srcCte: String, capacity: Long, shards: Int): String =
    s"""${packFoldCtes(srcCte, capacity, shards)}
       |SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       |       ROUND(sum(n_tokens) * 100.0 / $capacity, 2) AS fill_pct
       |FROM rec GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  /** The packing BAKE-OFF: every packing discipline this library
    * ships, run on the SAME corpus and summarized to one row each —
    * the numbers a pipeline owner reads to pick a discipline, and the
    * guard that keeps the four folds honest against each other:
    *
    *  - `n_bins` / `mean_fill_pct` / `padding_pct`: the GPU-time cost
    *    of the discipline. Chunking pads only the tape's final slot
    *    (fill ≈ 100%); next-fit trades padding for intact documents;
    *    the padding fraction IS that trade priced in tokens.
    *  - `mean_clusters_per_bin`: semantic coherence — the mean number
    *    of distinct embedding clusters a training sequence mixes
    *    (the [[packBinsSemantic]] discipline scores 1 by
    *    construction; id-order disciplines mix clusters arbitrarily —
    *    this column is the semantic row's "gain over id-order").
    *    Documents without an embedding don't count toward it (the
    *    same inner-join contract as `pipeline_pack_semantic`).
    *
    * The BPE row's capacity is in ITS token metric (1024 learned
    * tokens, `pipeline_pack_nextfit_bpe`'s configuration), so its
    * fill/padding compare within the row, not against the words rows.
    * Every per-doc assignment comes from the same folds the four
    * individual rows verify; the oracle re-aggregates the same CTE
    * chains (whitespace + BPE folds prefix-isolated so both recursive
    * folds coexist in one WITH). */
  def packReport(s: SparkSession, dir: String): DataFrame = {
    val capW = 256L; val capB = 1024L; val shards = 32; val steps = 6; val k = 8
    val wcnt = Tables(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val cl = Similarity.clusterAssignOn(
        Similarity.emb(s, dir).select(col("vec_id"), col("v")), k)
      .select(col("vec_id").as("doc_id"), col("centroid_id"))

    // one summary row from a per-doc (bin_key, doc_id, n_tokens) frame;
    // all ratios are computed sum-then-divide (never a streaming AVG,
    // whose accumulation order the oracle could not mirror)
    def summarize(name: String, metric: String, cap: Long,
                  perDoc: DataFrame): DataFrame = {
      val bins = perDoc.join(cl, Seq("doc_id"), "left")
        .groupBy(col("bin_key"))
        .agg(sum(col("n_tokens")).as("bt"), count(lit(1)).as("nd"),
          countDistinct(col("centroid_id")).as("ncl"))
      bins.agg(count(lit(1)).as("n_bins"), sum(col("nd")).as("n_docs"),
          sum(col("bt")).as("total_tokens"), sum(col("ncl")).as("nclsum"))
        .select(lit(name).as("discipline"), lit(metric).as("token_metric"),
          lit(cap).as("capacity"), col("n_bins"), col("n_docs"),
          col("total_tokens"),
          round(col("total_tokens") * 100.0 / (col("n_bins") * cap), 2)
            .as("mean_fill_pct"),
          round(lit(100.0) - col("total_tokens") * 100.0 / (col("n_bins") * cap), 2)
            .as("padding_pct"),
          round(col("nclsum").cast("double") / col("n_bins"), 4)
            .as("mean_clusters_per_bin"))
    }

    val nextfit = summarize("nextfit", "words", capW,
      packDocsNextFit(wcnt, capW, shards)
        .select(concat_ws(":", col("shard"), col("bin")).as("bin_key"),
          col("doc_id"), col("n_tokens")))
    val bpe = summarize("nextfit_bpe", "bpe", capB,
      packDocsNextFit(
          TextAnalysis.bpeDocTokenCounts(Tables(s, dir, "documents"), steps),
          capB, shards)
        .select(concat_ws(":", col("shard"), col("bin")).as("bin_key"),
          col("doc_id"), col("n_tokens")))
    val semantic = summarize("semantic", "words", capW,
      packDocsSemantic(s, dir, capW, k)
        .select(concat_ws(":", col("cluster"), col("bin")).as("bin_key"),
          col("doc_id"), col("n_tokens")))
    // chunk: bins/fill from the tape TOTALS (every slot but the last is
    // exactly full, so per-slot grouping would only rediscover the
    // formula); coherence over each doc's STARTING slot — slots no doc
    // starts in (the middle of a long straddler) aren't in the mean,
    // identically on both engines
    val chunkCoh = packSequences(s, dir, capW)
      .select(col("seq_id").as("bin_key"), col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .groupBy(col("bin_key"))
      .agg(countDistinct(col("centroid_id")).as("ncl"))
      .agg(round(sum(col("ncl")).cast("double") / count(lit(1)), 4)
        .as("mean_clusters_per_bin"))
    val chunk = wcnt
      .agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("nd"))
      .select(lit("chunk").as("discipline"), lit("words").as("token_metric"),
        lit(capW).as("capacity"),
        floor((col("total") + (capW - 1L)) / capW).cast("long").as("n_bins"),
        col("nd").as("n_docs"), col("total").as("total_tokens"))
      .withColumn("mean_fill_pct",
        round(col("total_tokens") * 100.0 / (col("n_bins") * capW), 2))
      .withColumn("padding_pct",
        round(lit(100.0) - col("total_tokens") * 100.0 / (col("n_bins") * capW), 2))
      .crossJoin(chunkCoh)
    chunk.unionByName(nextfit).unionByName(bpe).unionByName(semantic)
      .orderBy(col("discipline"))
  }

  /** Oracle for [[packReport]] — the four disciplines' own CTE chains,
    * re-aggregated to the same four summary rows. */
  private def packReportSql(capW: Long, capB: Long, shards: Int,
                            steps: Int, k: Int): String = {
    def summary(name: String, metric: String, cap: Long, src: String): String =
      s"""SELECT '$name' AS discipline, '$metric' AS token_metric,
         |  CAST($cap AS BIGINT) AS capacity,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(nd) AS BIGINT) AS n_docs,
         |  CAST(sum(bt) AS BIGINT) AS total_tokens,
         |  ${graft.OracleSql.round(s"sum(bt) * 100.0 / (count(*) * $cap)", 2)} AS mean_fill_pct,
         |  ${graft.OracleSql.round(s"100.0 - sum(bt) * 100.0 / (count(*) * $cap)", 2)} AS padding_pct,
         |  ${graft.OracleSql.round("CAST(sum(ncl) AS DOUBLE) / count(*)", 4)} AS mean_clusters_per_bin
         |FROM $src""".stripMargin
    val chunkBins = s"(total + ${capW - 1}) // $capW"
    s"""WITH RECURSIVE
       |wcnt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |         FROM documents),
       |${Similarity.clusterAssignSimCtes(k)},
       |cl AS (SELECT vec_id AS doc_id, centroid_id FROM casg),
       |${packFoldCtes("wcnt", capW, shards, "nf")},
       |${TextAnalysis.bpeDocTokenCountsCtes(steps)},
       |${packFoldCtes("bpecnt", capB, shards, "bp")},
       |${packSemanticDocCtes(capW)},
       |nfb AS (SELECT r.shard, r.bin, sum(r.n_tokens) AS bt, count(*) AS nd,
       |               count(DISTINCT c.centroid_id) AS ncl
       |        FROM nfrec r LEFT JOIN cl c USING (doc_id) GROUP BY r.shard, r.bin),
       |bpb AS (SELECT r.shard, r.bin, sum(r.n_tokens) AS bt, count(*) AS nd,
       |               count(DISTINCT c.centroid_id) AS ncl
       |        FROM bprec r LEFT JOIN cl c USING (doc_id) GROUP BY r.shard, r.bin),
       |smb AS (SELECT r.cluster, r.bin, sum(r.n_tokens) AS bt, count(*) AS nd,
       |               count(DISTINCT c.centroid_id) AS ncl
       |        FROM srec r LEFT JOIN cl c USING (doc_id) GROUP BY r.cluster, r.bin),
       |tape AS (SELECT doc_id,
       |           CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
       |         FROM wcnt),
       |chb AS (SELECT t.start // $capW AS bin_key,
       |               count(DISTINCT c.centroid_id) AS ncl
       |        FROM tape t LEFT JOIN cl c USING (doc_id) GROUP BY 1),
       |chc AS (SELECT ${graft.OracleSql.round("CAST(sum(ncl) AS DOUBLE) / count(*)", 4)} AS m
       |        FROM chb),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
       |               CAST(count(*) AS BIGINT) AS nd FROM wcnt)
       |SELECT * FROM (
       |  SELECT 'chunk' AS discipline, 'words' AS token_metric,
       |    CAST($capW AS BIGINT) AS capacity,
       |    CAST($chunkBins AS BIGINT) AS n_bins, nd AS n_docs, total AS total_tokens,
       |    ${graft.OracleSql.round(s"total * 100.0 / (($chunkBins) * $capW)", 2)} AS mean_fill_pct,
       |    ${graft.OracleSql.round(s"100.0 - total * 100.0 / (($chunkBins) * $capW)", 2)} AS padding_pct,
       |    chc.m AS mean_clusters_per_bin
       |  FROM tot, chc
       |  UNION ALL
       |  ${summary("nextfit", "words", capW, "nfb")}
       |  UNION ALL
       |  ${summary("nextfit_bpe", "bpe", capB, "bpb")}
       |  UNION ALL
       |  ${summary("semantic", "words", capW, "smb")}
       |) ORDER BY discipline""".stripMargin
  }

  /** Oracle for [[packBinsNextFit]]: whitespace counts feed the fold. */
  private def packBinsNextFitSql(capacity: Long, shards: Int): String =
    s"""WITH RECURSIVE wcnt AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |${packFoldSql("wcnt", capacity, shards)}""".stripMargin

  /** Oracle for [[packBinsNextFitBpe]]: the BPE training/apply CTE
    * chain ([[TextAnalysis.bpeDocTokenCountsCtes]]) feeds the same
    * recursive pack fold. */
  private def packBinsNextFitBpeSql(capacity: Long, shards: Int,
                                    steps: Int): String =
    s"""WITH RECURSIVE ${TextAnalysis.bpeDocTokenCountsCtes(steps)},
       |${packFoldSql("bpecnt", capacity, shards)}""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "pipeline_pack_nextfit" -> QueryDef((s, d) => packBinsNextFit(s, d, 256L, 32),
      Some(packBinsNextFitSql(256L, 32))),
    "pipeline_pack_nextfit_bpe" -> QueryDef(
      (s, d) => packBinsNextFitBpe(s, d, 1024L, 32, 6),
      Some(packBinsNextFitBpeSql(1024L, 32, 6))),
    "pipeline_pack_semantic" -> QueryDef(
      (s, d) => packBinsSemantic(s, d, 256L, 8),
      Some(packBinsSemanticSql(256L, 8))),
    "pipeline_pack_report" -> QueryDef((s, d) => packReport(s, d),
      Some(packReportSql(256L, 1024L, 32, 6, 8))),
    "corpus_shuffle_order" -> QueryDef((s, d) => shuffleOrder(s, d), Some(
      s"""WITH d AS (SELECT doc_id FROM documents),
         |${OracleSql.m61FmixScalarCtes("d", "CAST(doc_id AS VARCHAR)")},
         |h63 AS (SELECT doc_id, h & 9223372036854775807 AS hk FROM mh)
         |SELECT CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT) AS ord, doc_id
         |FROM h63 ORDER BY ord""".stripMargin)),
    "pipeline_dedup_keep_best" -> QueryDef((s, d) => dedupKeepBest(s, d), Some(
      s"""WITH RECURSIVE pairs AS (${Dedup.boundedJaccardSql}),
         |${Dedup.ccFromPairsSql},
         |$keepBestTailSql""".stripMargin)),
    "pipeline_multi_signal_keep_best" -> QueryDef((s, d) => multiSignalKeepBest(s, d), Some(
      s"""WITH RECURSIVE
         |${Dedup.multiSignalPairsCtes},
         |${Dedup.ccFromPairsSql},
         |$keepBestTailSql""".stripMargin)),
    "pipeline_contamination_bloom" -> QueryDef((s, d) => contaminationBloom(s, d), Some(
      s"""WITH $contamCte
         |SELECT c.doc_id, count(*) AS n_shared_grams
         |FROM g c JOIN eg USING (g)
         |WHERE c.doc_id >= 25
         |GROUP BY 1 ORDER BY 1""".stripMargin)),
    "pipeline_pack_sequences" -> QueryDef((s, d) => packSequences(s, d), Some(
      """WITH t AS (SELECT doc_id, coalesce(len(string_split(text, ' ')), 0) AS n_tokens FROM documents),
        |tape AS (SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       start // 2048 AS seq_id, start % 2048 AS offset_in_seq
        |FROM tape ORDER BY doc_id""".stripMargin)),
    "pipeline_contamination" -> QueryDef((s, d) => contaminationReport(s, d), Some(
      s"""WITH $contamCte
         |SELECT c.doc_id, count(*) AS n_shared_grams
         |FROM g c JOIN eg USING (g)
         |WHERE c.doc_id >= 25
         |GROUP BY 1 ORDER BY 1""".stripMargin)),
    "decontamination_fuzzy_verdicts" -> QueryDef((s, d) => fuzzyDecontamVerdicts(s, d), Some(
      s"""WITH ${Dedup.shingleHashCtesFrom("documents")},
         |szs AS (SELECT doc_id, CAST(len(th) AS BIGINT) AS sz FROM th),
         |sp AS (SELECT doc_id, unnest(th) AS g FROM th),
         |ev AS (SELECT s.doc_id AS e_doc, z.sz AS e_sz, s.g
         |       FROM sp s JOIN szs z USING (doc_id) WHERE s.doc_id < 25),
         |cp AS (SELECT s.doc_id, z.sz, s.g
         |       FROM sp s JOIN szs z USING (doc_id) WHERE s.doc_id >= 25),
         |sc AS (SELECT cp.doc_id, cp.sz, ev.e_doc, ev.e_sz, count(*) AS n_shared
         |       FROM cp JOIN ev USING (g) GROUP BY 1, 2, 3, 4),
         |mj AS (SELECT doc_id,
         |         max(CAST(n_shared AS DOUBLE) / (sz + e_sz - n_shared)) AS mj
         |       FROM sc GROUP BY 1)
         |SELECT t.doc_id,
         |  ${graft.OracleSql.round("coalesce(mj, 0)", 4)} AS max_eval_jac,
         |  coalesce(mj, 0) >= 0.5 AS contaminated
         |FROM (SELECT doc_id FROM th WHERE doc_id >= 25) t
         |LEFT JOIN mj USING (doc_id) ORDER BY t.doc_id""".stripMargin)),
    "pipeline_decontaminated" -> QueryDef((s, d) => decontaminated(s, d), Some(
      s"""WITH $contamCte,
         |bad AS (SELECT DISTINCT c.doc_id FROM g c JOIN eg USING (g) WHERE c.doc_id >= 25)
         |SELECT doc_id FROM documents
         |WHERE doc_id >= 25 AND doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin)),
    "pipeline_token_budget" -> QueryDef((s, d) => tokenBudgetSelect(s, d), Some(
      s"""WITH q AS (
         |  SELECT doc_id,
         |    ${TextAnalysis.qualityScoreSql} AS quality_score,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, quality_score, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT doc_id, quality_score, n_tokens, cum_tokens
         |FROM ranked WHERE cum_tokens <= 20000 ORDER BY cum_tokens""".stripMargin)),
    "pipeline_clean_corpus" -> QueryDef((s, d) => cleanCorpus(s, d), Some(
      s"""WITH keep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS k
         |    FROM documents) WHERE doc_id = k),
         |q AS (${TextAnalysis.qualityScoreSelect}),
         |${TextAnalysis.langBestCte},
         |pl AS (${TextAnalysis.predLangSelect})
         |SELECT keep.doc_id, pl.pred_lang, q.quality_score
         |FROM keep JOIN q ON keep.doc_id = q.doc_id
         |          JOIN pl ON keep.doc_id = pl.doc_id
         |WHERE q.quality_score >= 0.35 AND pl.pred_lang = 'en'
         |ORDER BY keep.doc_id""".stripMargin)),
    "pipeline_neardup_removal" -> QueryDef((s, d) => neardupRemoval(s, d), Some(
      s"""WITH pairs AS (${Dedup.boundedJaccardSql})
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
         |ORDER BY doc_id""".stripMargin)),
    "pipeline_full_prep" -> QueryDef((s, d) => fullPrep(s, d), Some(
      s"""WITH $fullPrepCtes
         |SELECT doc_id, quality_score, CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens
         |FROM ranked WHERE cum_tokens <= 5000 ORDER BY cum_tokens""".stripMargin)),
    // the report composes the SAME stage CTEs — counts cannot drift
    // from what pipeline_full_prep actually keeps
    "pipeline_stage_report" -> QueryDef((s, d) => stageReport(s, d), Some {
      def cnt(i: Int, name: String, src: String, tok: String) =
        s"""SELECT $i AS stage_id, '$name' AS stage, count(*) AS n_docs,
           |  CAST(coalesce(sum($tok), 0) AS BIGINT) AS n_tokens FROM $src""".stripMargin
      val rawTok = "coalesce(len(string_split(text, ' ')), 0)"
      s"""WITH $fullPrepCtes
         |${cnt(0, "raw", "documents", rawTok)}
         |UNION ALL ${cnt(1, "exact_dedup", "(SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id))", rawTok)}
         |UNION ALL ${cnt(2, "decontaminated", "surv1", rawTok)}
         |UNION ALL ${cnt(3, "quality_lang", "surv2", "n_tokens")}
         |UNION ALL ${cnt(4, "near_dedup", "surv3", "n_tokens")}
         |UNION ALL ${cnt(5, "token_budget", "(SELECT * FROM ranked WHERE cum_tokens <= 5000)", "n_tokens")}
         |ORDER BY stage_id""".stripMargin
    }),
    "pipeline_token_budget_per_lang" -> QueryDef((s, d) => tokenBudgetPerLang(s, d), Some(
      s"""WITH q AS (
         |  SELECT doc_id, lang,
         |    ${TextAnalysis.qualityScoreSql} AS quality_score,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (SELECT lang, CAST(floor(CAST(sum(n_tokens) AS DOUBLE) * 0.5) AS BIGINT) AS budget
         |      FROM q GROUP BY lang),
         |ranked AS (
         |  SELECT doc_id, lang, quality_score, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY quality_score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM q)
         |SELECT r.lang, doc_id, quality_score, n_tokens, cum_tokens
         |FROM ranked r JOIN b ON r.lang = b.lang
         |WHERE cum_tokens <= budget
         |ORDER BY r.lang, cum_tokens""".stripMargin)),
    // the repetition/LM fragments are the SAME strings the standalone
    // text_repetition / text_lm_surprisal oracles are built from
    // (TextAnalysis.repetitionCtes/lmXentCtes) — a fix there
    // propagates here instead of silently diverging
    "pipeline_quality_ensemble" -> QueryDef((s, d) => qualityEnsemble(s, d), Some(
      s"""WITH q AS (${TextAnalysis.qualityScoreSelect}),
         |${TextAnalysis.langBestCte},
         |pl AS (${TextAnalysis.predLangSelect}),
         |${TextAnalysis.repetitionCtes()},
         |${TextAnalysis.lmXentCtes("l")}
         |SELECT q.doc_id, q.quality_score, pl.pred_lang,
         |       rep.top_tok_frac, rep.dup_2gram_frac, lx.xent_bits,
         |       (q.quality_score >= 0.35 AND pl.pred_lang = 'en' AND
         |        rep.top_tok_frac <= 0.2 AND rep.dup_2gram_frac <= 0.2 AND
         |        lx.xent_bits <= 4.93) AS keep
         |FROM q JOIN pl USING (doc_id) JOIN rep USING (doc_id) JOIN lx USING (doc_id)
         |ORDER BY q.doc_id""".stripMargin)),
    // The same signal CTE prefix as the ensemble row (one source for
    // the gate definitions), aggregated into the kill-overlap matrix.
    "quality_filter_overlap" -> QueryDef((s, d) => qualityFilterOverlap(s, d), Some {
      val names = Seq("quality", "lang", "repetition", "lm")
      val pairs = (for { a <- names; b <- names } yield
        s"SELECT '$a' AS filter_a, '$b' AS filter_b, " +
          s"CAST(sum(CASE WHEN $a AND $b THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_killed FROM fl") ++ Seq(
        "SELECT 'any', 'any', CAST(sum(CASE WHEN quality OR lang OR repetition OR lm THEN 1 ELSE 0 END) AS BIGINT) FROM fl",
        "SELECT 'none', 'none', CAST(sum(CASE WHEN NOT (quality OR lang OR repetition OR lm) THEN 1 ELSE 0 END) AS BIGINT) FROM fl")
      s"""WITH q AS (${TextAnalysis.qualityScoreSelect}),
         |${TextAnalysis.langBestCte},
         |pl AS (${TextAnalysis.predLangSelect}),
         |${TextAnalysis.repetitionCtes()},
         |${TextAnalysis.lmXentCtes("l")},
         |fl AS MATERIALIZED (SELECT q.doc_id,
         |        q.quality_score < 0.35 AS quality,
         |        pl.pred_lang <> 'en' AS lang,
         |        (rep.top_tok_frac > 0.2 OR rep.dup_2gram_frac > 0.2) AS repetition,
         |        lx.xent_bits > 4.93 AS lm
         |      FROM q JOIN pl USING (doc_id) JOIN rep USING (doc_id) JOIN lx USING (doc_id))
         |SELECT filter_a, filter_b, n_docs_killed
         |FROM (${pairs.mkString(" UNION ALL ")})
         |ORDER BY filter_a, filter_b""".stripMargin
    }))
}
