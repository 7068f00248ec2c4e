package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization
  * stats, quality scoring, n-gram language identification, and
  * winnowing document fingerprints.
  *
  * Everything is Catalyst expressions / higher-order functions over a
  * single scan — per-document work with no shuffle at all (the only
  * shuffles below are final ORDER BYs for deterministic driver checks,
  * and histograms' groupBy). At 100 TB each of these runs as one
  * whole-stage-codegen'd map over the corpus.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  // -------------------------------------------------------------- tokens

  /** Whitespace token stats: counts, distinctness, lengths. All
    * integer arithmetic + int/int double division — bit-exact across
    * engines. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("t", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"),
        length(col("text")).cast("long").as("n_chars_text"),
        (size(array_distinct(col("t"))).cast("double") / size(col("t"))).as("ttr"))
      .orderBy(col("doc_id"))

  /** BPE-ish regex token count: word runs OR single non-space symbols —
    * the usual pre-tokenizer shape. ASCII corpus ⇒ identical \w
    * semantics across engines. */
  def regexTokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("""[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"""), lit(0)))
          .cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------- quality

  /** Per-document quality components + a weighted score. Component
    * ratios are int/int divisions; the score is a fixed-order linear
    * combination rounded at 4dp. */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val stop = array(stopwords.map(lit): _*)
    docs(s, dir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("n_stop",
        size(filter(col("t"), x => array_contains(stop, x))))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("ttr",
        size(array_distinct(col("t"))).cast("double") / col("n_tokens"))
      .withColumn("mean_token_len",
        (length(col("text")) - col("n_tokens") + 1).cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        round(col("ttr") * 0.5 + col("stop_ratio") * 0.2 +
          least(col("mean_token_len") / 10.0, lit(1.0)) * 0.3, 4))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_stop").cast("long").as("n_stop"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("ttr"), 4).as("ttr"),
        round(col("mean_token_len"), 4).as("mean_token_len"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Corpus language histogram over the labeled column. */
  def langHistogram(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"))

  // ------------------------------------------------------------- lang-id

  /** Profiles live in [[graft.functions.LangProfiles]] (shared with
    * the native scoring kernel); re-exported here for callers. */
  def trigramProfiles: Map[String, Seq[String]] = graft.functions.LangProfiles.trigrams
  def functionWords: Map[String, Seq[String]] = graft.functions.LangProfiles.functionWords

  /** Predict language by combined trigram-profile overlap + function
    * word hits (scored in one pass by the native
    * [[graft.functions.LangScores]] kernel — the HOF formulation
    * materialized a trigram array per document and intersected it per
    * profile, ~8× slower); `score` is the (0..1) mean of both
    * fractions. Ties break lexicographically (deterministic).
    * No evidence ⇒ 'und'. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = graft.functions.LangProfiles.langs.zipWithIndex.map {
      case (lang, i) =>
        struct(element_at(col("__ls"), i + 1).as("score"), lit(lang).as("lang"))
    }
    // argmax = last element of the sorted (score, lang) structs;
    // struct ordering is field-order, so score first, lang tie-break.
    df.withColumn("__ls", graft.functions.langFunctions.lang_scores(col(textCol)))
      .withColumn("best", element_at(sort_array(array(scored: _*)), -1))
      .withColumn("pred_lang",
        when(col("best.score") > 0, col("best.lang")).otherwise(lit("und")))
      .withColumn("lang_score", round(col("best.score"), 4))
      .drop("best", "__ls")
  }

  def langIdQuery(s: SparkSession, dir: String): DataFrame =
    langId(docs(s, dir))
      .select(col("doc_id"), col("pred_lang"), col("lang_score"))
      .orderBy(col("doc_id"))

  // --------------------------------------------------------- fingerprint

  /** Winnowing fingerprints (MOSS-style): k-gram hashes (polynomial
    * combination of 5 consecutive token xxhash64s, via the native
    * [[graft.functions.WinnowFingerprints]] kernel — the per-position
    * slice+concat HOF formulation was ~10× slower), then the distinct
    * minima of every sliding window of 4. Robust to local edits; two
    * documents sharing any retained window agree on that fingerprint.
    * Output is one row per document with the fingerprint count and
    * sketch min/max for spot checks. */
  private def withFps(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .selectExpr("doc_id", "transform(split(text, ' '), x -> xxhash64(x)) AS th")
      .select(col("doc_id"),
        graft.functions.textFunctions.winnow_fingerprints(col("th"), 5, 4).as("fps"))
      .filter(size(col("fps")) > 0)

  def fingerprints(s: SparkSession, dir: String): DataFrame =
    withFps(s, dir)
      .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
        array_min(col("fps")).as("fp_min"), array_max(col("fps")).as("fp_max"))
      .orderBy(col("doc_id"))

  /** Documents sharing at least `minShared` winnowing fingerprints —
    * the fingerprint flavor of near-dup detection (inverted-index join,
    * same scale posture as Dedup.jaccardPairs). */
  def fingerprintPairs(s: SparkSession, dir: String, minShared: Int = 2): DataFrame = {
    val fp = withFps(s, dir)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------ registry

  private def R(e: String, n: Int): String = OracleSql.round(e, n)

  val defs: Map[String, QueryDef] = Map(
    "text_token_stats" -> QueryDef(tokenStats, Some(
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  length(text) AS n_chars_text,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin)),
    "text_bpe_token_count" -> QueryDef(regexTokenCounts, Some(
      """SELECT doc_id, len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)),
    "text_quality" -> QueryDef(qualityScores, Some {
      val t = "string_split(text, ' ')"
      val nTok = s"len($t)"
      val nStop = s"len(list_filter($t, x -> x IN ('" + stopwords.mkString("','") + "')))"
      val stopRatio = s"CAST($nStop AS DOUBLE) / $nTok"
      val ttr = s"CAST(len(list_distinct($t)) AS DOUBLE) / $nTok"
      val mtl = s"CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok"
      s"""SELECT doc_id, $nTok AS n_tokens, $nStop AS n_stop,
         |  ${R(stopRatio, 4)} AS stop_ratio,
         |  ${R(ttr, 4)} AS ttr,
         |  ${R(mtl, 4)} AS mean_token_len,
         |  ${R(s"$ttr * 0.5 + $stopRatio * 0.2 + least($mtl / 10.0, 1.0) * 0.3", 4)} AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin
    }),
    "lang_histogram" -> QueryDef(langHistogram, Some(
      s"SELECT lang, count(*) AS n_docs, ${R("avg(n_chars)", 2)} AS avg_chars FROM documents GROUP BY lang ORDER BY lang")),
    // Heuristic / hash-based: rows-only checks, validated in TextAnalysisSpec.
    "text_langid" -> QueryDef(langIdQuery),
    "text_fingerprints" -> QueryDef(fingerprints),
    "text_fingerprint_pairs" -> QueryDef((s, d) => fingerprintPairs(s, d)))
}
