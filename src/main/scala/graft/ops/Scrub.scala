package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text scrubbing operators for corpus preparation: PII redaction and
  * line-level deduplication (the CCNet / RefinedWeb paragraph-dedup
  * pass — remove boilerplate lines that recur across documents, then
  * reassemble each document from its surviving lines in order).
  *
  * The synthetic documents table carries neither PII nor newlines, so
  * both driver queries PLANT their signal deterministically inside the
  * query (emails/IPs/phones keyed off doc_id; "lines" = fixed-width
  * word windows) with the identical planting mirrored in the DuckDB
  * oracle — the same fixture-in-the-query pattern the kdc_parse rows
  * use. The operators themselves ([[piiScrub]], [[lineDedup]]) are
  * input-agnostic: production callers hand them real text / real
  * newline-split lines.
  *
  * Scale posture:
  *  - [[piiScrub]] is per-row regexp kernels only — zero shuffle, one
  *    corpus scan, whole-stage codegen (Spark's native regexp_*
  *    expressions, no UDF). Patterns are written in the common
  *    Java-regex ∩ RE2 dialect so the DuckDB oracle runs them
  *    verbatim.
  *  - [[lineDedup]] is the canonical two-shuffle shape: explode to
  *    lines, aggregate line→distinct-doc frequency, anti/flag-join
  *    back, regroup by doc. Lines travel the wire as 8-byte
  *    M61+fmix64 hashes (the repo's DuckDB-reproducible family —
  *    collisions, P ≈ n²/2⁶⁴, produce IDENTICAL output on both
  *    engines), never as strings; document reassembly is a
  *    sort_array over (pos, line) structs inside the aggregate, not
  *    a window.
  */
object Scrub {

  // Common Java-regex ∩ RE2 dialect: no lookaround, no backrefs —
  // the oracle embeds these strings verbatim in DuckDB.
  private[ops] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[ops] val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Adds `n_emails`/`n_ipv4`/`n_phones` (match counts on the input
    * text) and `scrubbed` (all three classes replaced by typed
    * placeholder tokens, email → IP → phone order) to any frame with
    * a `textCol` string column. Counts are taken BEFORE redaction so
    * they report what was removed. */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    def count(re: String) =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    df.withColumn("n_emails", count(EmailRe))
      .withColumn("n_ipv4", count(Ipv4Re))
      .withColumn("n_phones", count(PhoneRe))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(regexp_replace(c,
          EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>"))
  }

  /** Deterministic PII planting for the driver row: doc_id % 3 == 0
    * gets an email, % 4 == 0 an IPv4, % 5 == 0 a phone — so the gate
    * exercises every count in {0, 1} and their combinations. Mirrored
    * literally in [[plantSql]]. */
  private def planted(d: DataFrame): DataFrame =
    d.withColumn("ptext", concat(
      col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" contact u"), col("doc_id").cast("string"), lit("@ex"),
          pmod(col("doc_id"), lit(7)).cast("string"), lit(".org")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit(" ip 10."), pmod(col("doc_id"), lit(200)).cast("string"),
          lit(".0."), pmod(col("doc_id"), lit(251)).cast("string")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" tel 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit(""))))

  // single line: this fragment is spliced into a stripMargin'd oracle,
  // where a line-leading "||" would lose its first pipe to the margin
  private val plantSql =
    "text || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' contact u' || doc_id || '@ex' || (doc_id % 7) || '.org' ELSE '' END || " +
      "CASE WHEN doc_id % 4 = 0 THEN ' ip 10.' || (doc_id % 200) || '.0.' || (doc_id % 251) ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 0 THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"

  /** Driver query: plant → scrub → per-doc counts + redacted text. */
  def piiScrubQuery(s: SparkSession, dir: String): DataFrame =
    piiScrub(planted(Tables(s, dir, "documents").select(col("doc_id"), col("text"))),
      "ptext")
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        col("scrubbed"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------- normalization

  /** Canonical text normalization (the C4-style pass run before
    * hashing for dedup): lowercase → strip everything outside
    * [a-z0-9 + whitespace] → collapse whitespace runs → trim. Adds
    * `normalized` plus before/after char counts. Pure per-row codegen
    * regexp/string kernels — zero shuffle, same dialect-safe regex
    * subset as [[piiScrub]]. ASCII-only corpus ⇒ `lower`/`upper` are
    * locale-free on both engines. */
  def normalize(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_chars_raw", length(c).cast("long"))
      .withColumn("normalized",
        trim(regexp_replace(regexp_replace(lower(c),
          "[^a-z0-9\\s]", ""), "\\s+", " ")))
      .withColumn("n_chars_norm", length(col("normalized")).cast("long"))
  }

  /** Driver query: plant case/whitespace/punctuation noise keyed off
    * doc_id (the synthetic corpus is already clean), normalize, and
    * surface counts + the normalized text. Noise mirrored in the
    * oracle. */
  def normalizeQuery(s: SparkSession, dir: String): DataFrame =
    normalize(
      Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("ntext", concat(
          lit("  "),
          when(pmod(col("doc_id"), lit(2)) === 0, upper(col("text")))
            .otherwise(col("text")),
          lit("  The  End!!  "))),
      "ntext")
      .select(col("doc_id"), col("n_chars_raw"), col("n_chars_norm"),
        col("normalized"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------- line dedup

  /** Splits each document's token stream into fixed-width `lineLen`
    * word windows — the stand-in for newline splitting on the
    * single-line synthetic corpus (a real corpus passes
    * `split(text, '\n')` instead). Output: (doc_id, pos, line). */
  def linesOf(df: DataFrame, lineLen: Int = 3): DataFrame = {
    require(lineLen >= 1, "lineLen must be >= 1")
    df.filter(col("text").isNotNull)
      .withColumn("t", split(col("text"), " "))
      .withColumn("lines", expr(
        s"transform(sequence(0, (size(t) + ${lineLen - 1}) div $lineLen - 1), " +
          s"i -> array_join(slice(t, i * $lineLen + 1, $lineLen), ' '))"))
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
  }

  /** Line-level dedup over a (doc_id, pos, line) frame: a line is
    * boilerplate when it occurs in ≥ `minDocs` DISTINCT documents
    * (within-doc repeats alone never trigger removal); every
    * occurrence of a boilerplate line is dropped and each document is
    * reassembled from its surviving lines in position order.
    * Output: (doc_id, kept_lines, removed_lines, text_deduped). */
  def lineDedup(lines: DataFrame, minDocs: Long = 2L): DataFrame = {
    val hashed = lines.withColumn("lh",
      graft.functions.textFunctions.m61_fmix_hash63(col("line")))
    val dupSet = hashed.groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("lh"), lit(true).as("dup"))
    hashed.join(dupSet, Seq("lh"), "left")
      .withColumn("dup", coalesce(col("dup"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(
        count(when(!col("dup"), 1)).as("kept_lines"),
        count(when(col("dup"), 1)).as("removed_lines"),
        array_join(
          transform(
            array_sort(collect_list(when(!col("dup"),
              struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("text_deduped"))
      .orderBy(col("doc_id"))
  }

  /** Driver query: 3-word lines, drop lines shared by ≥ 2 docs. The
    * 31-word synthetic vocabulary makes 3-word line collisions across
    * documents common (≈ birthday rate over 31³ possible lines), so
    * the removal genuinely fires at every SF. */
  def lineDedupQuery(s: SparkSession, dir: String): DataFrame =
    lineDedup(linesOf(Tables(s, dir, "documents").select(col("doc_id"), col("text"))))

  val defs: Map[String, QueryDef] = Map(
    "text_normalize" -> QueryDef((s, d) => normalizeQuery(s, d), Some(
      s"""WITH p AS (SELECT doc_id, '  ' ||
         |    CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END ||
         |    '  The  End!!  ' AS ntext FROM documents)
         |SELECT doc_id,
         |  length(ntext) AS n_chars_raw,
         |  length(trim(regexp_replace(regexp_replace(lower(ntext),
         |    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS n_chars_norm,
         |  trim(regexp_replace(regexp_replace(lower(ntext),
         |    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS normalized
         |FROM p ORDER BY doc_id""".stripMargin)),
    "text_pii_scrub" -> QueryDef((s, d) => piiScrubQuery(s, d), Some(
      s"""WITH p AS (SELECT doc_id, $plantSql AS ptext FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(ptext, '$EmailRe')) AS n_emails,
         |  len(regexp_extract_all(ptext, '$Ipv4Re')) AS n_ipv4,
         |  len(regexp_extract_all(ptext, '$PhoneRe')) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(ptext,
         |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |FROM p ORDER BY doc_id""".stripMargin)),
    "pipeline_line_dedup" -> QueryDef((s, d) => lineDedupQuery(s, d), Some(
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |             WHERE text IS NOT NULL),
         |ln AS (SELECT doc_id,
         |         unnest(range((len(t) + 2) // 3)) AS pos,
         |         unnest(list_transform(range((len(t) + 2) // 3),
         |           i -> array_to_string(list_slice(t, i * 3 + 1, i * 3 + 3), ' '))) AS line
         |       FROM tok),
         |${OracleSql.m61FmixScalarCtes("ln", "line")},
         |lh AS (SELECT doc_id, pos, line, h & 9223372036854775807 AS lh FROM mh),
         |dup AS (SELECT lh FROM lh GROUP BY lh HAVING count(DISTINCT doc_id) >= 2),
         |j AS (SELECT l.doc_id, l.pos, l.line, d.lh IS NOT NULL AS dup
         |      FROM lh l LEFT JOIN dup d ON l.lh = d.lh)
         |SELECT doc_id,
         |  count(*) FILTER (WHERE NOT dup) AS kept_lines,
         |  count(*) FILTER (WHERE dup) AS removed_lines,
         |  coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT dup), '')
         |    AS text_deduped
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)))
}
