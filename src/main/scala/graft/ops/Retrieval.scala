package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval scoring — the search-side complement of the
  * embedding ANN surface: BM25 (Robertson/Spärck Jones probabilistic
  * relevance, the Lucene-default `k1/b` parameterization with the
  * +1-smoothed idf so scores stay positive) over an inverted index.
  *
  * Query protocol mirrors the ANN queries: the first `nQueries`
  * documents act as queries, each contributing its first `qLen`
  * DISTINCT tokens — fully derived from the data, so the driver row
  * needs no side-channel query file.
  *
  * Determinism across engines: the per-(query,term,doc) contribution is
  * a libm `ln` away from exact, so it is rounded at 9dp and cast to
  * DECIMAL before the per-doc SUM — decimal addition is exact and
  * order-independent, making the summed score identical on Spark and
  * DuckDB regardless of partition order (see [[OracleSql.roundDec]]).
  * Ranking orders by that exact decimal, ties by doc_id.
  *
  * Scale posture (100 TB): tf is one (doc, term) map-side-combining
  * groupBy; df one more over it; the query-term set (nQueries·qLen
  * rows) and the one-row corpus stats broadcast — the corpus shuffles
  * ONCE (the tf groupBy) and the posting join `tf ⋈ broadcast(query
  * terms)` prunes to postings of query terms only before anything
  * widens. Top-k per query is a window over candidate docs of that
  * query, never a global sort of the corpus.
  */
object Retrieval {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** BM25 top-`k` documents per query. */
  def bm25TopK(s: SparkSession, dir: String,
               nQueries: Int = 3, qLen: Int = 4, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKOn(docs(s, dir), nQueries, qLen, k, k1, b)

  /** Generic variant over any (doc_id, text) frame. */
  def bm25TopKOn(df: DataFrame,
                 nQueries: Int = 3, qLen: Int = 4, k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Ranked(df, nQueries, qLen, k1, b)
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("sc").cast("double"), 4).as("score"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))

  /** The shared ranking frame: (query_id, doc_id, sc, rnk) with `sc`
    * the EXACT summed decimal score (un-rounded — [[mmrTopK]] does
    * exact decimal arithmetic on it) and `rnk` the (sc desc, doc_id)
    * row number per query. */
  private[ops] def bm25Ranked(df: DataFrame,
                              nQueries: Int, qLen: Int,
                              k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Parts(df, nQueries, qLen, k1, b).ranked

  /** The BM25 chain's intermediate frames, for operators that extend
    * it ([[prfTopK]] reuses postings, document frequencies, and the
    * query-term set). */
  private[ops] case class Bm25Parts(tf: DataFrame, dfreq: DataFrame,
                                    q: DataFrame, stats: DataFrame,
                                    ranked: DataFrame)

  /** Shared +1-smoothed idf; expects `n`/`df` in scope. */
  private def bm25Idf: Column =
    log((col("n").cast("double") - col("df") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)

  /** Shared tf saturation; expects `tf`/`dl`/`stot`/`n` in scope. */
  private def bm25TfPart(k1: Double, b: Double): Column = {
    val avgdl = col("stot").cast("double") / col("n").cast("double")
    (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        ((col("dl").cast("double") / avgdl) * b + (1.0 - b)) * k1)
  }

  private[ops] def bm25Parts(df: DataFrame,
                             nQueries: Int, qLen: Int,
                             k1: Double = 1.2, b: Double = 0.75): Bm25Parts = {
    val base = df
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
      .filter(col("dl") >= 1)
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("stot"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val q = base
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(col("t"), 1, qLen))).as("term"))
    // join ORDER matters at scale: tf ⋈ broadcast(query terms) prunes
    // the posting stream to query terms BEFORE anything joins the
    // document-frequency table (written the other way round, the full
    // corpus vocabulary shuffles through tf ⋈ dfreq first — Catalyst
    // does not reorder joins without CBO); dfreq itself shrinks to the
    // query terms via a broadcast semi-join, making every join here
    // broadcast-sized except the corpus-wide tf groupBy.
    val dfq = dfreq.join(broadcast(q.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    val contrib = tf.join(broadcast(q), "term")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c", round(bm25Idf * bm25TfPart(k1, b), 9).cast("decimal(20,9)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sc"), col("doc_id"))
    val ranked = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("sc"))
      .withColumn("rnk", row_number().over(w).cast("long"))
    Bm25Parts(tf, dfreq, q, stats, ranked)
  }

  /** WAND/MaxScore-adjacent BM25: candidate docs must match one of
    * each query's `nInformative` RAREST terms (lowest df — i.e.
    * highest idf, the terms with the largest score upper bounds);
    * candidates are then scored over ALL their query-term matches, so
    * every emitted score equals [[bm25TopKOn]]'s exactly. What the
    * prune drops is docs whose entire overlap with the query is its
    * commonest terms — the class an upper-bound traversal never
    * opens, because common terms' idf-bounded contributions cannot
    * reach a competitive threshold. (A per-query rank, not a global
    * df fraction: it prunes on any corpus shape, including uniformly
    * common synthetic vocabularies.)
    *
    * Scale posture: the candidate prune is the point. The commonest
    * query terms have the LONGEST posting lists (Zipf), and those
    * postings stop at the map side: candidate generation joins only
    * the rare terms' postings, and the (query,doc)-keyed semi-join
    * bounds what reaches the scoring groupBy's shuffle to candidate
    * rows. A scan-based engine has no skip lists, so the map-side
    * read itself is not skipped — that is the honest boundary of the
    * adjacency. */
  def bm25TopKPruned(s: SparkSession, dir: String,
                     nQueries: Int = 3, qLen: Int = 4, k: Int = 10,
                     k1: Double = 1.2, b: Double = 0.75,
                     nInformative: Int = 2): DataFrame =
    bm25TopKPrunedOn(docs(s, dir), nQueries, qLen, k, k1, b, nInformative)

  /** Generic variant over any (doc_id, text) frame. */
  def bm25TopKPrunedOn(df: DataFrame,
                       nQueries: Int = 3, qLen: Int = 4, k: Int = 10,
                       k1: Double = 1.2, b: Double = 0.75,
                       nInformative: Int = 2): DataFrame = {
    val base = df
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
      .filter(col("dl") >= 1)
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("stot"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val q = base
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(col("t"), 1, qLen))).as("term"))
    val avgdl = col("stot").cast("double") / col("n").cast("double")
    val idf = log((col("n").cast("double") - col("df") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val tfPart = (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") +
        ((col("dl").cast("double") / avgdl) * b + (1.0 - b)) * k1)
    val dfq = dfreq.join(broadcast(q.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    // informative = each query's nInformative rarest terms (df asc,
    // term tie-break); the frame is query-term-sized, so the rank
    // window and broadcasts are all tiny
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df"), col("term"))
    val informative = q.join(broadcast(dfq), "term")
      .withColumn("r", row_number().over(wq))
      .filter(col("r") <= nInformative)
      .select(col("query_id"), col("term"))
    val cand = tf
      .join(broadcast(informative), "term")
      .select(col("query_id"), col("doc_id")).distinct()
    val contrib = tf.join(broadcast(q), "term")
      .join(cand, Seq("query_id", "doc_id"), "left_semi")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c", round(idf * tfPart, 9).cast("decimal(20,9)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sc"), col("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("sc"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("sc").cast("double"), 4).as("score"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Reciprocal-rank fusion of the lexical (BM25) and semantic
    * (embedding cosine) top-k lists: rrf = Σ 1/(60 + rank) over the
    * lists a doc appears in — the standard score-free hybrid, fully
    * deterministic because it consumes only the INTEGER ranks of two
    * already-hash-checked components (doc_id and vec_id share one id
    * space in this corpus). Full-outer on (query, doc) so a doc found
    * by either retriever competes; re-ranked on the 9dp-rounded
    * fused score with a doc_id tie-break. */
  def hybridTopKRrf(s: SparkSession, dir: String,
                    nQueries: Int = 3, k: Int = 10): DataFrame = {
    val lex = bm25TopK(s, dir, nQueries = nQueries, k = k)
      .select(col("query_id"), col("doc_id"), col("rnk").as("r_lex"))
    val sem = Similarity.bruteForceTopK(s, dir, nQueries = nQueries, k = k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("r_sem"))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60.0) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_sem")), lit(0.0)), 9))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("rrf"), col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98)
    * of each query's BM25 top-`pool` candidates: greedily select `k`
    * docs maximizing `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the
    * diversified top-k a retrieval-augmented pipeline serves when the
    * plain top-k is near-duplicates of one answer.
    *
    * Exactness across engines (the argmax is the hazard — a last-ulp
    * score divergence flips a selection and cascades): rel is the
    * BM25 sum's EXACT decimal, sim the 9dp-rounded-decimal embedding
    * cosine (the bit-matching kernel fold), and λ = 0.7 enters as the
    * integer-scaled key `7·rel − 3·maxsim` — decimal multiply/
    * subtract are exact, so both engines order identical values,
    * doc_id breaking ties.
    *
    * Scale posture (100 TB): the corpus-wide work is [[bm25Ranked]]
    * (one tf shuffle) and ONE embeddings scan against a broadcast
    * candidate set to land the q·pool² pair-sim frame, which is
    * persisted — the k−1 greedy rounds iterate on that tiny cached
    * frame and never touch the corpus again. The sequential data
    * dependence is inherent to MMR (selection s+1 depends on 1..s);
    * it is paid on q·pool-sized frames, never corpus-sized ones.
    * The selected set (≤ q·k rows BY CONSTRUCTION) is collected to
    * the driver each round and re-enters as a `LocalRelation`, so
    * every round's plan is cached-frame ⋈ local — left distributed,
    * each round's plan references the previous round's THREE times
    * and the lineage compounds into a 3^k-leaf tree (measured: plan
    * explosion, then driver OOM, at k=5). */
  def mmrTopK(s: SparkSession, dir: String,
              nQueries: Int = 3, qLen: Int = 4, pool: Int = 10,
              k: Int = 5): DataFrame = {
    // persisted: every greedy round re-reads the candidate frame (and
    // round r's plan references round r−1's THREE times) — uncached,
    // the whole corpus-wide BM25 chain would recompute per reference
    val cand = bm25Ranked(docs(s, dir), nQueries, qLen)
      .filter(col("rnk") <= pool)
      .select(col("query_id"), col("doc_id"), col("sc"))
      .persist()
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = cand.select(col("query_id"), col("doc_id").as("a_id"))
    val b = cand.select(col("query_id"), col("doc_id").as("b_id"))
    val pairs = a.join(b, "query_id").filter(col("a_id") =!= col("b_id"))
      .join(e.select(col("vec_id").as("a_id"), col("v").as("va")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("v").as("vb")), "b_id")
      .select(col("query_id"), col("a_id"), col("b_id"),
        round(Similarity.cosine(col("va"), col("vb")), 9)
          .cast("decimal(20,9)").as("sim9"))
    // LOCAL GREEDY over the collected bounded state (guide-§8 "decide
    // with small rows"): the candidate frame is ≤ q·pool rows and the
    // pair frame ≤ q·pool² BY CONSTRUCTION (parameters, not data), so
    // the k-step selection — which is inherently sequential — runs as
    // scalar decimal arithmetic over ONE collect of each instead of
    // k driver-synchronized join+window jobs. Every compared value is
    // an exact decimal (sc from round9 sums, sim9 round9-staged), so
    // the local picks are bit-identical to the distributed window's
    // (mmr DESC, doc_id) order; the eligibility rule — a candidate
    // needs a pair row against some selected doc — mirrors the inner
    // rem ⋈ maxsim join this replaces.
    val candRows = cand.collect()
    val pairRows = pairs.collect()
    cand.unpersist(blocking = false)
    def idOf(v: Any): Long = v.asInstanceOf[Number].longValue
    val simOf = pairRows.map(r => (r.get(0), r.get(1), r.get(2)) -> r.getDecimal(3)).toMap
    val seven = java.math.BigDecimal.valueOf(7L)
    val three = java.math.BigDecimal.valueOf(3L)
    val sel = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    for ((q, csAll) <- candRows.groupBy(_.get(0))) {
      val remaining = scala.collection.mutable.ArrayBuffer(csAll: _*)
      def pickBy(score: org.apache.spark.sql.Row => java.math.BigDecimal,
                 eligible: org.apache.spark.sql.Row => Boolean): Option[org.apache.spark.sql.Row] =
        remaining.filter(eligible).sortBy(c => (score(c), -idOf(c.get(1))))(
          Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal], Ordering.Long)).lastOption
      val selected = scala.collection.mutable.ArrayBuffer.empty[Any]
      for (step <- 1 to k) {
        def maxSim(c: org.apache.spark.sql.Row): Option[java.math.BigDecimal] = {
          val sims = selected.flatMap(b => simOf.get((q, c.get(1), b)))
          if (sims.isEmpty) None else Some(sims.max(Ordering.ordered[java.math.BigDecimal]))
        }
        val pick =
          if (step == 1) pickBy(_.getDecimal(2), _ => true).map(c => (c, c.getDecimal(2).multiply(seven)))
          else pickBy(
            c => c.getDecimal(2).multiply(seven).subtract(maxSim(c).get.multiply(three)),
            c => maxSim(c).isDefined)
            .map { c => (c, c.getDecimal(2).multiply(seven).subtract(maxSim(c).get.multiply(three))) }
        pick.foreach { case (c, mmr) =>
          sel += org.apache.spark.sql.Row(q, c.get(1), step.toLong, mmr)
          selected += c.get(1)
          remaining -= c
        }
      }
    }
    val selSchema = org.apache.spark.sql.types.StructType(Seq(
      cand.schema("query_id"), cand.schema("doc_id"),
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("mmr",
        org.apache.spark.sql.types.DecimalType(25, 9), nullable = true)))
    s.createDataFrame(java.util.Arrays.asList(sel.toSeq: _*), selSchema)
      .select(col("query_id"), col("doc_id"), col("step"),
        round(col("mmr").cast("double"), 4).as("mmr"))
      .orderBy(col("query_id"), col("step"))
  }

  /** Pseudo-relevance-feedback query expansion (RM3-style, Lavrenko &
    * Croft '01 relevance models by way of the Indri/Galago RM3
    * mixture): each query's BM25 top-`fb` documents are assumed
    * relevant, their terms are weighted by summed normalized-tf × idf,
    * the top-`m` terms NOT already in the query join it, and the
    * corpus is rescored once with the expanded query — original terms
    * weighted 7, expansion terms 3 (the λ=0.7 mixture as exact integer
    * scaling, the [[mmrTopK]] trick).
    *
    * Exactness across engines: feedback term weights are per-(doc,
    * term) `round9((tf/dl)·idf)` decimals summed exactly; the rescore
    * reuses BM25's round9-decimal contribution with the integer weight
    * multiplied in (long × decimal is exact) — so term selection,
    * scores, and ranks are bit-identical on Spark and DuckDB, ties by
    * term / doc_id.
    *
    * Scale posture (100 TB): the corpus-wide work is the tf shuffle
    * BM25 already pays, re-run once per scoring pass (within each
    * pass Spark's exchange reuse dedupes it); everything else is
    * broadcast-sized — the feedback-doc set (q·fb rows) and expanded
    * query (q·(qLen+m) rows) are bounded BY CONSTRUCTION and re-enter
    * as collected LocalRelations (referenced as plans, each
    * downstream branch re-expands the whole feedback chain — measured
    * 50 broadcast joins in one plan, ~3× the row's cost), and the df
    * table prunes to the query terms by semi-join. The rescore is the
    * SAME pruned posting join as [[bm25Ranked]], just against a
    * slightly wider term set. */
  def prfTopK(s: SparkSession, dir: String,
              nQueries: Int = 3, qLen: Int = 4, fb: Int = 5, m: Int = 3,
              k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val parts = bm25Parts(docs(s, dir), nQueries, qLen, k1, b)
    // PRF runs THREE actions over the BM25 chain (feedback-doc
    // collect, expanded-query collect, the rescore itself) — without
    // these persists each one re-tokenizes the corpus and re-shuffles
    // the tf groupBy from parquet (three full passes for one). The
    // cached frames are the posting table (hashes/terms + counts, the
    // same thing the index rows persist) and the 1-row stats; cache
    // lifetime per the boundedSharedCounts contract.
    val tf = parts.tf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    parts.stats.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = parts.dfreq
    // feedback docs are ≤ q·fb rows BY CONSTRUCTION — collect them so
    // the ranked window chain runs once in its own job instead of
    // re-expanding inside every downstream broadcast branch
    val fbPlan = parts.ranked.filter(col("rnk") <= fb)
      .select(col("query_id"), col("doc_id"))
    val fbDocs = s.createDataFrame(
      java.util.Arrays.asList(fbPlan.collect().toSeq: _*), fbPlan.schema)
    val tfFb = tf.join(broadcast(fbDocs), "doc_id")
    val dfFb = dfreq.join(
      broadcast(tfFb.select(col("term")).distinct()), Seq("term"), "left_semi")
    val tw = tfFb.join(broadcast(dfFb), "term")
      .crossJoin(broadcast(parts.stats))
      .withColumn("w9", round(col("tf").cast("double") / col("dl").cast("double")
        * bm25Idf, 9).cast("decimal(20,9)"))
      .groupBy(col("query_id"), col("term")).agg(sum(col("w9")).as("w"))
    val wExp = Window.partitionBy(col("query_id")).orderBy(desc("w"), col("term"))
    val expansion = tw.join(parts.q, Seq("query_id", "term"), "left_anti")
      .withColumn("r", row_number().over(wExp)).filter(col("r") <= m)
      .select(col("query_id"), col("term"), lit(3L).as("wt"))
    // the expanded query is ≤ q·(qLen+m) rows BY CONSTRUCTION —
    // collect it and re-enter as a LocalRelation. Referenced as a
    // plan, `eq` re-expands the whole feedback chain (ranked window,
    // term weights, anti-join) at EVERY reference, and the rescore
    // below references it twice: measured 50 broadcast joins + 14
    // replicated stats cross-joins in one plan, ~20 s for a ~2 s row.
    val eqPlan = parts.q.select(col("query_id"), col("term"), lit(7L).as("wt"))
      .unionByName(expansion)
    val eq = s.createDataFrame(
      java.util.Arrays.asList(eqPlan.collect().toSeq: _*), eqPlan.schema)
    val dfEq = dfreq.join(
      broadcast(eq.select(col("term")).distinct()), Seq("term"), "left_semi")
    val contrib = tf.join(broadcast(eq), "term")
      .join(broadcast(dfEq), "term")
      .crossJoin(broadcast(parts.stats))
      .withColumn("wc", (col("wt") *
        round(bm25Idf * bm25TfPart(k1, b), 9).cast("decimal(20,9)"))
        .cast("decimal(25,9)"))
    val wRnk = Window.partitionBy(col("query_id")).orderBy(desc("sc"), col("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("wc")).as("sc"))
      .withColumn("rnk", row_number().over(wRnk).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"),
        round(col("sc").cast("double"), 4).as("score"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // ------------------------------------------------------------ registry

  /** The BM25 ranking CTE chain (through `rnk`) — shared by the
    * bm25_topk oracle and the hybrid-fusion oracle so the two cannot
    * drift. */
  private val bm25RankCtes: String =
    s"""base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
       |bn AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM base WHERE len(t) >= 1),
       |stats AS (SELECT count(*) AS n, sum(dl) AS stot FROM bn),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       |       FROM (SELECT doc_id, dl, unnest(t) AS term FROM bn) GROUP BY doc_id, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q AS (SELECT doc_id AS query_id, unnest(list_distinct(list_slice(t, 1, 4))) AS term
       |      FROM bn WHERE doc_id < 3),
       |contrib AS (SELECT q.query_id, tf.doc_id,
       |    ${OracleSql.roundDec(
             // parenthesized to mirror the Scala evaluation order
             // exactly — a*b/c associates differently from a*(b/c)
             // in IEEE doubles
             "ln((n - df + 0.5) / (df + 0.5) + 1.0) * " +
               "((tf * 2.2) / (tf + (dl / (CAST(stot AS DOUBLE) / n) * 0.75 + 0.25) * 1.2))", 9)} AS c
       |  FROM tf JOIN dfreq USING (term) JOIN q USING (term) CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id, sum(c) AS sc FROM contrib GROUP BY query_id, doc_id),
       |rnk AS (SELECT query_id, doc_id, sc,
       |          row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id) AS rnk FROM sc)""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "bm25_topk" -> QueryDef((s, d) => bm25TopK(s, d), Some(
      s"""WITH $bm25RankCtes
         |SELECT query_id, doc_id, ${OracleSql.round("CAST(sc AS DOUBLE)", 4)} AS score, rnk
         |FROM rnk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),
    "hybrid_topk_rrf" -> QueryDef((s, d) => hybridTopKRrf(s, d), Some(
      s"""WITH $bm25RankCtes,
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |scored AS (
         |  SELECT vq.vec_id AS query_id, vc.vec_id AS doc_id,
         |         ${Similarity.cosSqlFor("vq", "vc")} AS sim
         |  FROM e vq JOIN e vc ON vq.vec_id < 3 AND vc.vec_id >= 3),
         |srnk AS (SELECT query_id, doc_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rnk
         |         FROM scored),
         |lex AS (SELECT query_id, doc_id, rnk AS r_lex FROM rnk WHERE rnk <= 10),
         |sem AS (SELECT query_id, doc_id, rnk AS r_sem FROM srnk WHERE rnk <= 10),
         |fused AS (SELECT coalesce(l.query_id, sm.query_id) AS query_id,
         |            coalesce(l.doc_id, sm.doc_id) AS doc_id,
         |            CAST(${OracleSql.roundDecSub(
                        "coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_lex), 0) + " +
                          "coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_sem), 0)", 9)} AS DOUBLE) AS rrf
         |          FROM lex l FULL OUTER JOIN sem sm
         |            ON l.query_id = sm.query_id AND l.doc_id = sm.doc_id),
         |frnk AS (SELECT query_id, doc_id, rrf,
         |           row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
         |         FROM fused)
         |SELECT query_id, doc_id, rrf, CAST(rnk AS BIGINT) AS rnk
         |FROM frnk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),
    "retrieval_mmr_topk" -> QueryDef((s, d) => mmrTopK(s, d), Some(
      s"""WITH RECURSIVE $bm25RankCtes,
         |cand AS (SELECT query_id, doc_id, sc FROM rnk WHERE rnk <= 10),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |pairs AS (SELECT a.query_id, a.doc_id AS a_id, b.doc_id AS b_id,
         |            ${OracleSql.roundDecSub(Similarity.cosSqlFor("ea", "eb"), 9)} AS sim9
         |          FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
         |          JOIN e ea ON ea.vec_id = a.doc_id
         |          JOIN e eb ON eb.vec_id = b.doc_id),
         |sel AS (
         |  SELECT query_id, doc_id, 1 AS step, [doc_id] AS picked,
         |         CAST(7 * sc AS DECIMAL(25,9)) AS mmr
         |  FROM (SELECT query_id, doc_id, sc,
         |          row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id) AS r
         |        FROM cand) WHERE r = 1
         |  UNION ALL
         |  SELECT query_id, doc_id, step, picked, mmr FROM (
         |    SELECT t.query_id, t.doc_id, t.step, t.picked, t.mmr,
         |           row_number() OVER (PARTITION BY t.query_id ORDER BY t.mmr DESC, t.doc_id) AS r
         |    FROM (
         |      SELECT s.query_id, c.doc_id, s.step + 1 AS step,
         |             list_append(s.picked, c.doc_id) AS picked,
         |             CAST(7 * c.sc - 3 * max(p.sim9) AS DECIMAL(25,9)) AS mmr
         |      FROM sel s
         |      JOIN cand c ON c.query_id = s.query_id AND NOT list_contains(s.picked, c.doc_id)
         |      JOIN pairs p ON p.query_id = s.query_id AND p.a_id = c.doc_id
         |           AND list_contains(s.picked, p.b_id)
         |      WHERE s.step < 5
         |      GROUP BY s.query_id, c.doc_id, s.step, s.picked, c.sc
         |    ) t
         |  ) WHERE r = 1
         |)
         |SELECT query_id, doc_id, CAST(step AS BIGINT) AS step,
         |       ${OracleSql.round("CAST(mmr AS DOUBLE)", 4)} AS mmr
         |FROM sel ORDER BY query_id, step""".stripMargin),
      notes = "MMR diversified re-rank: greedy argmax on the integer-scaled " +
        "exact-decimal key 7*rel - 3*maxsim, oracle replays the greedy as a " +
        "recursive CTE carrying the picked-set list"),
    "retrieval_prf_topk" -> QueryDef((s, d) => prfTopK(s, d), Some(
      s"""WITH $bm25RankCtes,
         |fb AS (SELECT query_id, doc_id FROM rnk WHERE rnk <= 5),
         |tw AS (SELECT fb.query_id, tf.term,
         |         SUM(${OracleSql.roundDec(
                     "(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)) * " +
                       "ln((n - df + 0.5) / (df + 0.5) + 1.0)", 9)}) AS w
         |       FROM tf JOIN fb USING (doc_id) JOIN dfreq USING (term)
         |       CROSS JOIN stats GROUP BY 1, 2),
         |twn AS (SELECT tw.query_id, tw.term, tw.w FROM tw
         |        ANTI JOIN q ON q.query_id = tw.query_id AND q.term = tw.term),
         |expn AS (SELECT query_id, term, CAST(3 AS BIGINT) AS wt FROM (
         |           SELECT query_id, term,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY w DESC, term) AS r
         |           FROM twn) WHERE r <= 3),
         |eq AS (SELECT query_id, term, CAST(7 AS BIGINT) AS wt FROM q
         |       UNION ALL SELECT query_id, term, wt FROM expn),
         |c2 AS (SELECT eq.query_id, tf.doc_id,
         |         CAST(eq.wt * ${OracleSql.roundDec(
                     "ln((n - df + 0.5) / (df + 0.5) + 1.0) * " +
                       "((tf * 2.2) / (tf + (dl / (CAST(stot AS DOUBLE) / n) * 0.75 + 0.25) * 1.2))", 9)}
         |              AS DECIMAL(25,9)) AS wc
         |       FROM tf JOIN eq USING (term) JOIN dfreq USING (term)
         |       CROSS JOIN stats),
         |sc2 AS (SELECT query_id, doc_id, SUM(wc) AS sc FROM c2 GROUP BY 1, 2),
         |rnk2 AS (SELECT query_id, doc_id, sc,
         |           row_number() OVER (PARTITION BY query_id
         |                              ORDER BY sc DESC, doc_id) AS rnk FROM sc2)
         |SELECT query_id, doc_id, ${OracleSql.round("CAST(sc AS DOUBLE)", 4)} AS score,
         |       CAST(rnk AS BIGINT) AS rnk
         |FROM rnk2 WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin),
      notes = "RM3-style pseudo-relevance feedback: top-5 docs feed top-3 " +
        "expansion terms by exact-decimal (tf/dl)*idf weight, rescore with " +
        "7/3 integer-scaled term weights"),
    "bm25_topk_pruned" -> QueryDef((s, d) => bm25TopKPruned(s, d), Some(
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
         |bn AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM base WHERE len(t) >= 1),
         |stats AS (SELECT count(*) AS n, sum(dl) AS stot FROM bn),
         |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
         |       FROM (SELECT doc_id, dl, unnest(t) AS term FROM bn) GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |q AS (SELECT doc_id AS query_id, unnest(list_distinct(list_slice(t, 1, 4))) AS term
         |      FROM bn WHERE doc_id < 3),
         |inf AS (SELECT query_id, term FROM (
         |          SELECT q.query_id, q.term,
         |                 row_number() OVER (PARTITION BY q.query_id ORDER BY df, q.term) AS r
         |          FROM q JOIN dfreq USING (term)) WHERE r <= 2),
         |cand AS (SELECT DISTINCT inf.query_id, tf.doc_id
         |         FROM tf JOIN inf USING (term)),
         |contrib AS (SELECT q.query_id, tf.doc_id,
         |    ${OracleSql.roundDec(
               "ln((n - df + 0.5) / (df + 0.5) + 1.0) * " +
                 "((tf * 2.2) / (tf + (dl / (CAST(stot AS DOUBLE) / n) * 0.75 + 0.25) * 1.2))", 9)} AS c
         |  FROM tf JOIN dfreq USING (term) JOIN q USING (term) CROSS JOIN stats
         |       JOIN cand ON cand.query_id = q.query_id AND cand.doc_id = tf.doc_id),
         |sc AS (SELECT query_id, doc_id, sum(c) AS sc FROM contrib GROUP BY query_id, doc_id),
         |rnk AS (SELECT query_id, doc_id, sc,
         |          row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id) AS rnk FROM sc)
         |SELECT query_id, doc_id, ${OracleSql.round("CAST(sc AS DOUBLE)", 4)} AS score, rnk
         |FROM rnk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)))
}
