package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * RNG-based `df.sample` is irreproducible across engines, runs, and
  * partitionings; at 100 TB the standard practice is HASH sampling:
  * a row is in the sample iff a stable content hash of its key falls
  * under a threshold. Same rows selected on every engine, every rerun,
  * any partitioning — and rates compose (a 5% sample is a subset of
  * the 20% sample under the same hash). Implemented as a comparison
  * on the md5 hex prefix (lowercase hex in both Spark and DuckDB, so
  * the oracle is the identical expression), evaluated per-row in the
  * scan stage: no shuffle at all.
  */
object Sampling {

  /** Rows whose md5(key) hex prefix sorts below `hexThreshold` —
    * e.g. "1a" keeps ≈ 26/256 ≈ 10.2%. */
  def hashSampleCol(key: Column, hexThreshold: String): Column =
    substring(md5(key.cast("string")), 1, hexThreshold.length) < hexThreshold

  /** ~10% deterministic document sample. */
  def sampleDocs(s: SparkSession, dir: String,
                 hexThreshold: String = "1a"): DataFrame =
    Tables(s, dir, "documents")
      .filter(hashSampleCol(col("doc_id"), hexThreshold))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Stratified hash sample: per-language thresholds rebalance corpus
    * composition (downsample the dominant language, keep the tails) —
    * the usual pre-training mixture adjustment, still fully
    * deterministic. Unlisted strata are dropped. */
  def stratifiedSampleDocs(s: SparkSession, dir: String,
                           thresholds: Map[String, String] = Map(
                             "en" -> "20", "de" -> "cc", "es" -> "cc",
                             "fr" -> "cc", "zh" -> "cc")): DataFrame = {
    val pred = thresholds.map { case (lang, thr) =>
      col("lang") === lang && hashSampleCol(col("doc_id"), thr)
    }.reduce(_ || _)
    Tables(s, dir, "documents")
      .filter(pred)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  /** Deterministic train/val/test split assignment: the md5 bucket of
    * the doc id routes each document to exactly one split (hex prefix
    * < "e6" → train ≈ 230/256 ≈ 89.8%, < "f3" → val ≈ 13/256 ≈ 5.1%,
    * else test ≈ 5.1%). Rerun-stable, engine-independent, and
    * leak-free by construction: membership is a pure function of the
    * id, so no re-shard, re-sort, or incremental append can move a
    * document across splits — the property RNG splitting loses the
    * moment data arrives twice. Evaluated in the scan stage, no
    * shuffle. */
  def splitAssign(s: SparkSession, dir: String,
                  trainHex: String = "e6", valHex: String = "f3"): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), bucket.as("bucket"),
        when(bucket < trainHex, "train")
          .when(bucket < valHex, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Train/test LEAKAGE audit: near-duplicate pairs whose members
    * landed in DIFFERENT splits — the contamination a random
    * per-document split always produces (near-copies of training
    * documents sitting in the eval split inflate every metric).
    * Composes the bounded-Jaccard pair generator with
    * [[splitAssign]]'s hash split; the output is the leak list a
    * dedup-aware splitter must empty. Pair-graph-sized — the split
    * relation joins doc-keyed onto the (already sub-linear) pair
    * frame. */
  def splitLeakagePairs(s: SparkSession, dir: String,
                        trainHex: String = "e6", valHex: String = "f3"): DataFrame = {
    val sp = splitAssign(s, dir, trainHex, valHex)
      .select(col("doc_id"), col("split"))
    Dedup.jaccardPairs(s, dir)
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The REPAIR for [[splitLeakagePairs]]: split by the near-dup
    * CLUSTER id instead of the document id, so every member of a
    * duplicate cluster lands in the same split BY CONSTRUCTION —
    * the dedup-aware splitting rule training pipelines adopt once
    * the leakage audit comes back non-empty. Loners (docs in no
    * cluster) use their own id as the cluster key, which degenerates
    * to [[splitAssign]] exactly where there is nothing to leak. */
  def clusterConsistentSplit(s: SparkSession, dir: String,
                             trainHex: String = "e6",
                             valHex: String = "f3"): DataFrame = {
    val labels = Dedup.neardupClusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    val bucket = substring(md5(col("cluster_id").cast("string")), 1, 2)
    Tables(s, dir, "documents").select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"),
        when(bucket < trainHex, "train")
          .when(bucket < valHex, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic WEIGHTED sample (Efraimidis–Spirakis exponential
    * keys, A-ES): each doc gets key = ln(u)/w with u a hash-uniform in
    * (0, 1] derived from the M61+fmix64 hash of its id and w its
    * weight (n_chars here — longer docs proportionally likelier); the
    * top-n keys ARE a weighted sample without replacement. Every step
    * is a pure function of the data, so the sample is rerun-stable and
    * engine-reproducible where RNG weighted sampling is not; ranking
    * uses the 9dp-ROUNDED key (ties broken by doc_id) so a libm ln ulp
    * cannot flip the selection boundary. Plan: scan-stage key
    * computation + TakeOrderedAndProject — no shuffle beyond the
    * bounded top-n merge. */
  def weightedSampleDocs(s: SparkSession, dir: String, n: Int = 50): DataFrame = {
    val h = graft.functions.textFunctions.m61_fmix_hash63(col("doc_id"))
    // cast BEFORE the +1: h + 1L overflows Long (ANSI exception) for
    // the one-in-2^63 hash equal to Long.MaxValue; the double add never
    // does, and the oracle mirrors the cast-then-add order exactly
    val u = (h.cast("double") + 1.0) / lit(9.223372036854775808e18)
    Tables(s, dir, "documents")
      .withColumn("wkey", round(log(u) / col("n_chars").cast("double"), 9))
      .select(col("doc_id"), col("n_chars"), col("wkey"))
      .orderBy(desc("wkey"), col("doc_id"))
      .limit(n)
  }

  /** Neyman-optimal stratified sample allocation: split a fixed
    * sampling budget across strata proportionally to N_h·σ_h — the
    * allocation that minimizes the variance of the stratified mean
    * estimator (Neyman 1934), versus the naive proportional split
    * that over-samples large-but-homogeneous strata. The row emits
    * both allocations side by side: the gap IS the decision (a
    * high-variance minority stratum earns a multiple of its
    * proportional share). This is the planning half of every
    * eval/labeling budget question a curation pipeline asks; the
    * execution half is the existing deterministic hash sampling with
    * per-stratum thresholds ([[stratifiedSampleDocs]]).
    *
    * Determinism: σ_h comes from exact 6dp-decimal moments (the
    * module-standard recipe — order-independent sums, ONE IEEE
    * expression after); the weight N_h·σ_h is re-rounded to a 6dp
    * DECIMAL before the cross-strata total so the denominator is an
    * exact order-free sum, not a float accumulation; integer parts
    * come from floor (no midpoint hazard) and the leftover budget
    * goes to the largest fractional remainders with a (remainder
    * DESC, stratum ASC) total order. Everything after the one
    * fact-sized moment aggregate runs on the strata frame — bounded
    * by |event types|, the calendar-frame contract. */
  def neymanAllocation(s: SparkSession, dir: String,
                       budget: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = EventQueries.events(s, dir)
      .select(col("event_type"),
        round(col("value"), 6).cast("decimal(18,6)").as("v"))
    val m = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("sv2"))
      .select(col("event_type"), col("n"),
        sqrt(greatest(
          (col("sv2").cast("double") -
            col("sv").cast("double") * col("sv").cast("double") /
              col("n").cast("double")) / col("n").cast("double"),
          lit(0.0d))).as("std"))
      .withColumn("w",
        round(col("n").cast("double") * col("std"), 6).cast("decimal(30,6)"))
    val totals = m.agg(sum(col("w")).as("sw"), sum(col("n")).as("nt"))
    val scored = m.crossJoin(broadcast(totals))
      .withColumn("target",
        lit(budget.toDouble) * (col("w").cast("double") / col("sw").cast("double")))
      .withColumn("base", floor(col("target")))
      .withColumn("rem", col("target") - col("base"))
      // proportional contrast: exact integer arithmetic throughout
      .withColumn("proportional_n", expr(s"(n * $budget) DIV nt"))
    val deficit = scored.agg((lit(budget.toLong) - sum(col("base"))).as("d"))
    // deliberate unpartitioned window: the strata frame is bounded by
    // |event types| — the calendar-frame contract
    val w = Window.orderBy(col("rem").desc, col("event_type"))
    scored.crossJoin(broadcast(deficit))
      .withColumn("rk", row_number().over(w))
      .select(col("event_type"), col("n").as("n_events"),
        round(col("std"), 4).as("std"),
        (col("base") + when(col("rk") <= col("d"), 1L).otherwise(0L))
          .cast("long").as("neyman_n"),
        col("proportional_n").cast("long").as("proportional_n"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, QueryDef] = Map(
    "sample_neyman_alloc" -> QueryDef((s, d) => neymanAllocation(s, d), Some {
      val std = "sqrt(greatest((CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0))"
      s"""WITH ev AS (SELECT event_type,
         |  CAST(${graft.OracleSql.round("value", 6)} AS DECIMAL(18,6)) AS v FROM events),
         |mo AS (SELECT event_type, count(*) AS n, sum(v) AS sv, sum(v * v) AS sv2
         |       FROM ev GROUP BY 1),
         |st AS (SELECT event_type, n, $std AS std,
         |         CAST(${graft.OracleSql.round(s"CAST(n AS DOUBLE) * ($std)", 6)}
         |           AS DECIMAL(30,6)) AS w
         |       FROM mo),
         |tot AS (SELECT sum(w) AS sw, sum(n) AS nt FROM st),
         |sc AS (SELECT event_type, n, std,
         |         1000.0 * (CAST(w AS DOUBLE) / CAST((SELECT sw FROM tot) AS DOUBLE)) AS target,
         |         (n * 1000) // (SELECT nt FROM tot) AS proportional_n
         |       FROM st),
         |fb AS (SELECT *, floor(target) AS base, target - floor(target) AS rem FROM sc),
         |dk AS (SELECT 1000 - sum(base) AS d FROM fb),
         |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, event_type) AS rk FROM fb)
         |SELECT event_type, CAST(n AS BIGINT) AS n_events,
         |  ${graft.OracleSql.round("std", 4)} AS std,
         |  CAST(base + CASE WHEN rk <= (SELECT d FROM dk) THEN 1 ELSE 0 END AS BIGINT) AS neyman_n,
         |  CAST(proportional_n AS BIGINT) AS proportional_n
         |FROM rk ORDER BY event_type""".stripMargin
    }),
    "sample_docs_weighted" -> QueryDef((s, d) => weightedSampleDocs(s, d), Some(
      s"""WITH ${graft.OracleSql.m61FmixScalarCtes("documents", "CAST(doc_id AS VARCHAR)")}
         |SELECT doc_id, n_chars,
         |  ${graft.OracleSql.round(
             "ln((CAST(h & 9223372036854775807 AS DOUBLE) + 1.0) / 9223372036854775808.0) / CAST(n_chars AS DOUBLE)", 9)} AS wkey
         |FROM mh ORDER BY wkey DESC, doc_id LIMIT 50""".stripMargin)),
    "sample_split_assign" -> QueryDef((s, d) => splitAssign(s, d), Some(
      """SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Leakage audit + its repair: the pair generator and the CC chain
    // are the Dedup module's shared oracle sources, so the split rows
    // cannot drift from the dedup rows they compose.
    "split_leakage_pairs" -> QueryDef((s, d) => splitLeakagePairs(s, d), Some(
      s"""WITH pairs AS (${Dedup.boundedJaccardSql}),
         |sp AS (SELECT doc_id,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
         |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT doc_a, doc_b, a.split AS split_a, b.split AS split_b, jac
         |FROM pairs JOIN sp a ON doc_a = a.doc_id JOIN sp b ON doc_b = b.doc_id
         |WHERE a.split <> b.split
         |ORDER BY doc_a, doc_b""".stripMargin)),
    "cluster_consistent_split" -> QueryDef((s, d) => clusterConsistentSplit(s, d), Some(
      s"""WITH RECURSIVE pairs AS (${Dedup.boundedJaccardSql}),
         |${Dedup.ccFromPairsSql},
         |cl AS (SELECT d.doc_id, coalesce(lb.cluster_id, d.doc_id) AS cluster_id
         |       FROM documents d LEFT JOIN labels lb ON d.doc_id = lb.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
         |       WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM cl ORDER BY doc_id""".stripMargin)),
    "sample_docs_hash" -> QueryDef((s, d) => sampleDocs(s, d), Some(
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        |ORDER BY doc_id""".stripMargin)),
    "sample_docs_stratified" -> QueryDef((s, d) => stratifiedSampleDocs(s, d), Some(
      """SELECT lang, count(*) AS n_docs FROM documents
        |WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20')
        |   OR (lang IN ('de', 'es', 'fr', 'zh') AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc')
        |GROUP BY lang ORDER BY lang""".stripMargin)))
}
