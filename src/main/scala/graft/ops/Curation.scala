package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and tokenization: context-window chunking, vocabulary
  * induction + OOV-rate scoring, and domain-mixture rebalancing.
  * All fully deterministic and DuckDB-oracle-checked.
  *
  * Scale posture (100 TB):
  *  - [[docChunks]] is a per-row generate (explode of a computed
  *    range) — no shuffle at all; output size is corpus/stride rows.
  *  - [[vocabOovRate]] builds the vocabulary with one
  *    map-side-combining groupBy + TakeOrderedAndProject (top-V is
  *    per-partition top-k then a V-row merge, never a global sort) and
  *    broadcasts the V-row vocab back; the per-doc scoring join is
  *    broadcast, so the corpus is scanned twice and shuffled once
  *    (the token-count groupBy).
  *  - [[mixtureBalance]] derives per-stratum hash-sampling thresholds
  *    from the stratum counts (one small aggregate, broadcast back)
  *    and filters in the scan stage via the same md5-prefix predicate
  *    as [[Sampling]] — rates compose, reruns are stable, and no row
  *    ever shuffles to be sampled.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  // ------------------------------------------------------------ chunking

  /** Sliding-window context chunks: windows of `chunkSize` tokens at
    * `stride` steps (stride < chunkSize ⇒ overlap, the usual LM
    * pre-tokenization layout). A doc with n ≤ chunkSize tokens is one
    * chunk; otherwise ceil((n − chunkSize)/stride) + 1 chunks, the
    * last one short. Output: (doc_id, chunk_id, start_tok,
    * n_chunk_tokens, chunk_text). */
  def docChunks(s: SparkSession, dir: String,
                chunkSize: Int = 128, stride: Int = 64): DataFrame =
    docChunksOn(docs(s, dir), chunkSize, stride)

  /** Generic variant over any (doc_id, text) frame. */
  def docChunksOn(df: DataFrame,
                  chunkSize: Int = 128, stride: Int = 64): DataFrame = {
    require(stride >= 1 && chunkSize >= stride,
      "need 1 <= stride <= chunkSize so every token lands in some chunk")
    df
      .filter(col("text").isNotNull)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n", size(col("t")).cast("long"))
      .filter(col("n") >= 1)
      .withColumn("nc",
        when(col("n") <= chunkSize, lit(1L))
          .otherwise(expr(s"(n - $chunkSize + $stride - 1) div $stride + 1")))
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_chunk_tokens",
        least(lit(chunkSize.toLong), col("n") - col("start_tok")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("t"),
          (col("start_tok") + 1).cast("int"), col("n_chunk_tokens").cast("int"))))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_chunk_tokens"), col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // ---------------------------------------------------- vocabulary / OOV

  /** Top-`v` corpus vocabulary by raw occurrence count (ties broken by
    * token text), then each doc's out-of-vocabulary occurrence rate —
    * the tokenizer-coverage score curation pipelines gate on. */
  def vocabOovRate(s: SparkSession, dir: String, v: Int = 25): DataFrame =
    vocabOovRateOn(docs(s, dir), v)

  /** Generic variant over any (doc_id, text) frame. */
  def vocabOovRateOn(df: DataFrame, v: Int = 25): DataFrame = {
    val base = df
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .filter(col("n_tokens") >= 1)
    val tok = base.select(col("doc_id"), explode(col("t")).as("tok"))
    val vocab = tok.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("tok"))
      .limit(v)
      .select(col("tok"))
    val inVocab = tok.join(broadcast(vocab), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_in_vocab"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(inVocab, Seq("doc_id"), "left")
      .withColumn("n_in_vocab", coalesce(col("n_in_vocab"), lit(0L)))
      .withColumn("oov_rate",
        round((col("n_tokens") - col("n_in_vocab")).cast("double") /
          col("n_tokens"), 6))
      .select(col("doc_id"), col("n_tokens"), col("n_in_vocab"), col("oov_rate"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------ mixture balance

  /** Rebalance the corpus language mixture to uniform by DETERMINISTIC
    * hash downsampling: every language is sampled at rate
    * min_lang_count / lang_count via the same md5-prefix predicate as
    * [[Sampling.hashSampleCol]], with the threshold derived from the
    * counts (thr = (min·256) div count 2-hex-digit prefix; thr ≥ 256
    * keeps everything). Output per language: docs before, the derived
    * threshold, docs after. The sampled SET is a deterministic
    * function of the data — rerun-stable, engine-independent, and
    * composable with any other hash-sampling stage. */
  def mixtureBalance(s: SparkSession, dir: String): DataFrame =
    mixtureBalanceOn(docs(s, dir), "lang", "doc_id")

  /** Generic variant: rebalance any frame to its smallest stratum,
    * sampling deterministically on md5(`keyCol`). */
  def mixtureBalanceOn(df: DataFrame, stratumCol: String, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_before"))
    val mn = counts.agg(min(col("n_before")).as("mn"))
    val rates = counts.crossJoin(broadcast(mn))
      .withColumn("thr", expr("(mn * 256) div n_before"))
      .withColumn("thr_hex", lpad(lower(hex(col("thr"))), 2, "0"))
    val kept = df.join(broadcast(rates), Seq(stratumCol))
      .filter(col("thr") >= 256 ||
        substring(md5(col(keyCol).cast("string")), 1, 2) < col("thr_hex"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_after"))
    rates.join(kept, Seq(stratumCol), "left")
      .select(col(stratumCol), col("n_before"), col("thr_hex"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .orderBy(col(stratumCol))
  }

  /** Temperature-based mixture reweighting (the multilingual sampling
    * rule of mBERT/XLM-R/mT5): raw language share p_l is flattened to
    * q_l = p_l^α / Σ p^α with α = 0.3, and `boost` = q_l / p_l is the
    * up/down-sampling factor each language's documents get — >1 for
    * tail languages, <1 for the head. The report a mixture designer
    * reads BEFORE sampling (the [[mixtureBalance]] row is the
    * equal-size limit α = 0).
    *
    * Scale posture: one count aggregate over the corpus; everything
    * after is language-cardinality-sized with two broadcast one-row
    * totals.
    *
    * Determinism: p^α goes through pow once and is staged to 9dp
    * DECIMAL (the shared recipe — the normalizer Σ q is then an
    * exact sum), and every surfaced ratio is one fixed IEEE
    * expression over those exact values. */
  def temperatureMixture(s: SparkSession, dir: String,
                         alpha: Double = 0.3): DataFrame = {
    val counts = docs(s, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).cast("double").as("tot"))
    val q = counts.crossJoin(broadcast(tot))
      .withColumn("p_raw_d", col("n_docs").cast("double") / col("tot"))
      .withColumn("q", round(pow(col("p_raw_d"), alpha), 9).cast("decimal(20,9)"))
    val z = q.agg(sum(col("q")).as("z"))
    q.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"),
        round(col("p_raw_d"), 4).as("p_raw"),
        round(col("q").cast("double") / col("z").cast("double"), 4).as("p_temp"),
        round((col("q").cast("double") / col("z").cast("double")) / col("p_raw_d"), 4)
          .as("boost"))
      .orderBy(col("lang"))
  }

  // ------------------------------------------------------- source mixture

  /** Provenance mixture report: per (source, lang) document and token
    * counts plus corpus share — the composition dashboard every
    * curation run publishes alongside its output (the input to
    * [[mixtureBalance]]-style rebalancing decisions). One groupBy +
    * a broadcast one-row total. */
  def sourceMixture(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val total = base.agg(count(lit(1)).as("total"))
    base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .crossJoin(broadcast(total))
      .withColumn("doc_share",
        round(col("n_docs").cast("double") / col("total"), 6))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("doc_share"))
      .orderBy(col("source"), col("lang"))
  }

  // ------------------------------------------------------------ registry

  // ------------------------------------------------------------ novelty

  /** Per-document novelty against everything ingested BEFORE it
    * (doc_id as ingestion order — the crawl-cursor model the ingest
    * loop already uses): the fraction of a document's word-3-gram
    * shingles whose corpus-wide FIRST occurrence is an earlier
    * document. Novelty ≈ marginal information: a curation policy
    * ranks fresh intake by it (near-1 = new content, near-0 = seen it
    * all before), a softer signal than the binary near-dup verdict and
    * cheaper than pairwise scoring — no pair enumeration at all.
    * Shingles ride the SAME native kernel chain as the Jaccard family
    * ([[Dedup.shingledOn]] + M61+fmix64 hashes), so the oracle
    * reproduces hashes verbatim and collisions cannot diverge engines.
    *
    * Scale posture: one posting frame (8-byte hashes, never text)
    * shuffled for the per-gram min-doc aggregate, re-joined on the
    * same key (exchange reuse), then one per-doc aggregate — three
    * shuffles, all on hashes, no quadratic stage anywhere. */
  def docNovelty(s: SparkSession, dir: String): DataFrame =
    docNoveltyOn(docs(s, dir))

  /** Generic variant over any (doc_id, text) frame. */
  def docNoveltyOn(df: DataFrame): DataFrame = {
    val posting = Dedup.shingledOn(df)
      .select(col("doc_id"),
        explode(graft.functions.textFunctions.m61_token_hashes(col("shingles"))).as("g"))
      // first-seen set and per-doc scoring both read this frame;
      // persist so the shingling kernel lineage runs once (cache
      // lifetime: Dedup.boundedSharedCounts' contract)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstSeen = posting.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    posting.join(firstSeen, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
          .as("n_seen_before"))
      .withColumn("novelty_frac",
        round(lit(1.0) - col("n_seen_before") / col("n_shingles"), 4))
      .select(col("doc_id"), col("n_shingles"), col("n_seen_before"),
        col("novelty_frac"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, QueryDef] = Map(
    // Novelty oracle rides the shared shingle-hash CTE chain (th),
    // then an independent min-doc-per-gram formulation.
    "doc_novelty" -> QueryDef((s, d) => docNovelty(s, d), Some(
      s"""WITH ${Dedup.shingleHashCtesFrom("documents")},
         |sp AS (SELECT doc_id, unnest(th) AS g FROM th),
         |fs AS (SELECT g, min(doc_id) AS first_doc FROM sp GROUP BY g),
         |agg AS (SELECT sp.doc_id, count(*) AS n_shingles,
         |          CAST(sum(CASE WHEN fs.first_doc < sp.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |            AS n_seen_before
         |        FROM sp JOIN fs USING (g) GROUP BY sp.doc_id)
         |SELECT doc_id, n_shingles, n_seen_before,
         |  ${OracleSql.round("1.0 - CAST(n_seen_before AS DOUBLE) / n_shingles", 4)} AS novelty_frac
         |FROM agg ORDER BY doc_id""".stripMargin)),
    "source_mixture" -> QueryDef((s, d) => sourceMixture(s, d), Some(
      s"""WITH t AS (SELECT count(*) AS total FROM documents)
         |SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  ${OracleSql.round("CAST(count(*) AS DOUBLE) / total", 6)} AS doc_share
         |FROM documents CROSS JOIN t
         |GROUP BY source, lang, total ORDER BY source, lang""".stripMargin)),
    "doc_chunks" -> QueryDef((s, d) => docChunks(s, d), Some(
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) >= 1),
        |nc AS (SELECT *, CASE WHEN n <= 128 THEN 1 ELSE (n - 128 + 63) // 64 + 1 END AS nc FROM n),
        |ch AS (SELECT doc_id, t, n, unnest(range(nc)) AS chunk_id FROM nc)
        |SELECT doc_id, chunk_id, chunk_id * 64 AS start_tok,
        |  least(128, n - chunk_id * 64) AS n_chunk_tokens,
        |  array_to_string(list_slice(t, chunk_id * 64 + 1,
        |    chunk_id * 64 + least(128, n - chunk_id * 64)), ' ') AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)),
    "vocab_oov_rate" -> QueryDef((s, d) => vocabOovRate(s, d), Some(
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL),
         |bn AS (SELECT doc_id, t, len(t) AS n_tokens FROM base WHERE len(t) >= 1),
         |tok AS (SELECT doc_id, unnest(t) AS tok FROM bn),
         |vocab AS (SELECT tok FROM (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok)
         |          ORDER BY cnt DESC, tok LIMIT 25),
         |iv AS (SELECT doc_id, count(*) AS n_in_vocab
         |       FROM tok JOIN vocab USING (tok) GROUP BY doc_id)
         |SELECT bn.doc_id, n_tokens, coalesce(n_in_vocab, 0) AS n_in_vocab,
         |  ${OracleSql.round("CAST(n_tokens - coalesce(n_in_vocab, 0) AS DOUBLE) / n_tokens", 6)} AS oov_rate
         |FROM bn LEFT JOIN iv ON bn.doc_id = iv.doc_id
         |ORDER BY bn.doc_id""".stripMargin)),
    "mixture_temperature" -> QueryDef((s, d) => temperatureMixture(s, d), Some(
      s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM c),
         |q AS (SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / tot AS p_raw_d,
         |        ${OracleSql.roundDecSub(s"pow(CAST(n_docs AS DOUBLE) / tot, ${0.3})", 9)} AS q
         |      FROM c CROSS JOIN t),
         |z AS (SELECT sum(q) AS z FROM q)
         |SELECT lang, n_docs,
         |  ${OracleSql.round("p_raw_d", 4)} AS p_raw,
         |  ${OracleSql.round("CAST(q AS DOUBLE) / CAST(z AS DOUBLE)", 4)} AS p_temp,
         |  ${OracleSql.round("(CAST(q AS DOUBLE) / CAST(z AS DOUBLE)) / p_raw_d", 4)} AS boost
         |FROM q CROSS JOIN z ORDER BY lang""".stripMargin)),
    "mixture_balance" -> QueryDef((s, d) => mixtureBalance(s, d), Some(
      """WITH counts AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
        |mn AS (SELECT min(n_before) AS mn FROM counts),
        |rates AS (SELECT lang, n_before, (mn * 256) // n_before AS thr,
        |            lpad(lower(to_hex((mn * 256) // n_before)), 2, '0') AS thr_hex
        |          FROM counts CROSS JOIN mn),
        |kept AS (SELECT d.lang, count(*) AS n_after
        |         FROM documents d JOIN rates r ON d.lang = r.lang
        |         WHERE r.thr >= 256 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < r.thr_hex
        |         GROUP BY d.lang)
        |SELECT r.lang, n_before, thr_hex, coalesce(n_after, 0) AS n_after
        |FROM rates r LEFT JOIN kept k ON r.lang = k.lang
        |ORDER BY r.lang""".stripMargin)))
}
