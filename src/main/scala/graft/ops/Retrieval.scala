package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
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
