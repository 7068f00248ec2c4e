package graft.ops

import graft.{OracleSql, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching.
  *
  * The engine's own register sketches (HLL `approx_count_distinct`,
  * GK `percentile_approx`) have engine-private state not reproducible
  * by an independent engine; both remain available (and error-bound
  * property-tested) but since round 9 every DRIVER row here rides a
  * deterministic k-min-set construction instead, so the whole sketch
  * family is DuckDB hash-checked. KMV (k-minimum-values) is the
  * oracle-checkable workhorse: keep the k smallest values of a uniform hash of the
  * distinct keys; with r_k = the k-th smallest hash scaled to [0, 1),
  * E[distinct] ≈ (k-1)/r_k (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07). Every step
  * is deterministic — the hash is the library's M61+fmix64 family,
  * reproducible in DuckDB with HUGEINT arithmetic — so the driver row
  * is a full hash check, unlike any RNG- or register-based sketch.
  *
  * Scale posture: the hash is computed in the scan stage; `k smallest`
  * is a TakeOrderedAndProject (per-partition top-k, then a k-row merge
  * on the driver — never a global sort); the estimate is an aggregate
  * over ≤ k rows. The sketch is mergeable (union of KMV sets, re-take
  * k smallest), which is what makes it usable per-partition /
  * per-day at 100 TB.
  */
object Sketches {

  private def hash63(c: Column): Column =
    graft.functions.textFunctions.m61_fmix_hash63(c)

  /** Generic KMV distinct-count over any key column: one row
    * (k_eff, kth_hash, est_users). With fewer than k distinct hashes
    * the sketch IS the distinct set and the estimate is exact
    * (k_eff < k branch); otherwise est = (k-1) · 2^63 / kth_hash. */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 32): DataFrame = {
    val topk = df
      .select(hash63(key).as("hm"))
      .distinct()
      .orderBy(col("hm"))
      .limit(k)
    topk.agg(count(lit(1)).as("k_eff"), max(col("hm")).as("kth_hash"))
      .select(col("k_eff"), col("kth_hash"),
        round(when(col("k_eff") < k, col("k_eff").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
            col("kth_hash").cast("double")), 4).as("est_users"))
  }

  /** KMV estimate of distinct users in `events`. */
  def kmvUserCardinality(s: SparkSession, dir: String, k: Int = 32): DataFrame =
    kmvDistinct(Tables(s, dir, "events"), col("user_id"), k)

  /** [[kmvUserCardinality]] through the REAL Structured Streaming
    * micro-batch engine — the continuously-maintained cardinality a
    * corpus intake dashboard reads: the k-set lives in streaming
    * aggregation state (RocksDB) as a typed [[KmvAgg]] buffer and
    * every micro-batch folds its new hashes in. THE point of KMV over
    * register sketches here: the k-min-set end state is a function of
    * the SET of inputs — arrival order, batch boundaries, and
    * partition layout all cancel — so the streaming row shares the
    * batch row's DuckDB oracle verbatim (the strongest equivalence
    * check two engines can give), where an HLL's register state would
    * be engine-private. Complete-mode global aggregate: state is one
    * ≤ k-element buffer, output one row per trigger, the sink keeps
    * the final snapshot (the dedup_exact_streaming contract). */
  def kmvUserCardinalityStreaming(s: SparkSession, dir: String,
                                  k: Int = 32): DataFrame = {
    val sch = Tables(s, dir, "events").schema
    // glob so the file source's basePath lands on the directory (the
    // established streaming-source recipe, see Dedup)
    val src = s.readStream.schema(sch).parquet(s"$dir/events.parque[t]")
    val kmv = udaf(new KmvAgg(k))
    val agg = src
      .select(hash63(col("user_id")).as("hm"))
      .agg(kmv(col("hm")).as("sk"))
      .select(size(col("sk.hs")).cast("long").as("k_eff"),
        element_at(col("sk.hs"), size(col("sk.hs"))).as("kth_hash"))
      .select(col("k_eff"), col("kth_hash"),
        round(when(col("k_eff") < k, col("k_eff").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
            col("kth_hash").cast("double")), 4).as("est_users"))
    graft.streaming.StreamingPipeline.runOneShot(
      agg, "kmv_stream", "complete", Seq("k_eff"))
  }

  /** KMV SET-OPERATION estimates — the multiset-ops half of Beyer et
    * al. SIGMOD'07, and what makes KMV the audience-overlap sketch:
    * |A|, |B| from each side's sketch, |A∪B| from the MERGED sketch
    * (union the two k-sets, re-take the k smallest — the mergeability
    * that lets 100 TB build per-partition sketches and combine k-row
    * summaries), and |A∩B| by inclusion–exclusion over the surfaced
    * estimates, floored at 0. A = `typeA` users, B = `typeB` users.
    * Every step is the deterministic M61+fmix hash — full oracle
    * check, like the cardinality row. */
  def kmvUserOverlap(s: SparkSession, dir: String, k: Int = 32,
                     typeA: String = "click", typeB: String = "purchase"): DataFrame = {
    val ev = Tables(s, dir, "events")
    def sketch(t: String) = ev.filter(col("event_type") === t)
      .select(hash63(col("user_id")).as("hm"))
      .distinct().orderBy(col("hm")).limit(k)
    def est(df: DataFrame, nm: String) =
      df.agg(count(lit(1)).as("keff"), max(col("hm")).as("kth"))
        .select(round(when(col("keff") < k, col("keff").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
            col("kth").cast("double")), 4).as(nm))
    val a = sketch(typeA)
    val b = sketch(typeB)
    val merged = a.unionByName(b).distinct().orderBy(col("hm")).limit(k)
    est(a, "est_a").crossJoin(est(b, "est_b")).crossJoin(est(merged, "est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)), 4)
          .as("est_intersect"))
  }

  /** Per-group KMV distinct-count — the grouped flavor of
    * [[kmvDistinct]], replacing the engine-private HLL register sketch
    * on the `approx_user_cardinality` driver row (the HLL path itself
    * stays exercised as an error-bound property test on
    * [[graft.ops.EventQueries.approxUserCardinality]]): per event
    * type, the k-min-set lives in the typed mergeable [[KmvAgg]]
    * buffer (≤ k longs of state per group, partial→merge→final across
    * partitions — the same bounded-state single-pass shape HLL gives),
    * and the (k−1)/r_k estimate surfaces beside the exact row count.
    * Every step is the deterministic M61+fmix63 hash, a pure function
    * of the input SET — which is what upgrades the row from rows-only
    * to a full DuckDB hash check. */
  def kmvUserCardinalityByType(s: SparkSession, dir: String,
                               k: Int = 32): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    Tables(s, dir, "events")
      .select(col("event_type"), hash63(col("user_id")).as("hm"))
      .groupBy(col("event_type"))
      .agg(kmv(col("hm")).as("sk"), count(lit(1)).as("n_events"))
      .select(col("event_type"),
        round(when(size(col("sk.hs")) < k, size(col("sk.hs")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9223372036854775808.0) /
            element_at(col("sk.hs"), size(col("sk.hs"))).cast("double")), 4)
          .as("approx_users"),
        col("n_events"))
      .orderBy(col("event_type"))
  }

  /** Per-group approximate percentiles over a BOTTOM-K HASH SAMPLE —
    * the deterministic, oracle-checkable replacement for the
    * engine-private Greenwald-Khanna register sketch on the
    * `approx_value_percentiles` driver row (the GK path stays as the
    * error-bound property test on
    * [[graft.ops.EventQueries.approxValuePercentiles]]): the k rows
    * with the smallest M61+fmix63(event_id) per event type are a
    * uniform random sample DETERMINED BY THE DATA (bottom-k sampling —
    * the same k-min-set mergeability as KMV: union two samples,
    * re-take the k smallest, so per-shard samples combine at 100 TB),
    * and the exact interpolated percentiles of the sample estimate the
    * population's with rank error ~ sqrt(p(1−p)/k). Sample membership
    * is a pure function of the input set and the interpolation is the
    * cross-engine-proven `percentile`/`quantile_cont` pair (4dp
    * equality established by the exact `value_percentiles` row), so
    * the row is a full hash check. */
  def sampledValuePercentiles(s: SparkSession, dir: String,
                              k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = Tables(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        hash63(col("event_id")).as("hm"), col("event_id"))
    // (hm, event_id) is a TOTAL order: event_id is unique, so sample
    // membership cannot flip between engines on a hash collision
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("hm"), col("event_id"))
    v.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D))").as("p"),
        count(lit(1)).as("sample_n"))
      .select(col("event_type"),
        round(element_at(col("p"), 1), 4).as("p25"),
        round(element_at(col("p"), 2), 4).as("p50"),
        round(element_at(col("p"), 3), 4).as("p75"),
        col("sample_n"))
      .orderBy(col("event_type"))
  }

  /** Oracle for [[kmvUserCardinalityByType]]: per-type distinct user
    * hashes, per-type k-min set via a partitioned row_number, the
    * (k−1)/r_k estimate beside the exact event count. */
  private[ops] def kmvUsersByTypeOracleSql(k: Int = 32): String =
    s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
       |${OracleSql.m61FmixScalarCtes("du", "CAST(user_id AS VARCHAR)")},
       |hm AS (SELECT DISTINCT event_type, h & 9223372036854775807 AS hm FROM mh),
       |rk AS (SELECT event_type, hm,
       |         row_number() OVER (PARTITION BY event_type ORDER BY hm) AS rn
       |       FROM hm),
       |ag AS (SELECT event_type, count(*) AS k_eff, max(hm) AS kth
       |       FROM rk WHERE rn <= $k GROUP BY event_type),
       |n AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type)
       |SELECT ag.event_type,
       |  ${OracleSql.round(
           s"CASE WHEN k_eff < $k THEN CAST(k_eff AS DOUBLE) " +
             s"ELSE ${(k - 1).toDouble} * 9223372036854775808.0 / CAST(kth AS DOUBLE) END", 4)} AS approx_users,
       |  n.n_events
       |FROM ag JOIN n ON ag.event_type = n.event_type
       |ORDER BY ag.event_type""".stripMargin

  /** Oracle for [[sampledValuePercentiles]]: the same bottom-k hash
    * sample (total (hm, event_id) order), quantile_cont interpolation
    * rounded at 4dp — the value_percentiles cross-engine recipe. */
  private[ops] def sampledValuePctOracleSql(k: Int = 256): String =
    s"""WITH v AS (SELECT event_type, value, event_id FROM events
       |           WHERE value IS NOT NULL),
       |${OracleSql.m61FmixScalarCtes("v", "CAST(event_id AS VARCHAR)")},
       |rk AS (SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY h & 9223372036854775807, event_id) AS rn
       |       FROM mh),
       |smp AS (SELECT event_type, value FROM rk WHERE rn <= $k)
       |SELECT event_type,
       |  ${OracleSql.round("quantile_cont(value, 0.25)", 4)} AS p25,
       |  ${OracleSql.round("quantile_cont(value, 0.5)", 4)} AS p50,
       |  ${OracleSql.round("quantile_cont(value, 0.75)", 4)} AS p75,
       |  count(*) AS sample_n
       |FROM smp GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Misra-Gries candidate keys, one bounded summary per partition.
    *
    * Per-partition guarantee (Misra-Gries '82): a key occurring more
    * than n_p/(k+1) times in partition p survives p's summary; summing
    * the contrapositive over partitions, any key with GLOBAL frequency
    * > N/(k+1) survives in at least one partition — so the union of
    * the per-partition summaries is a SUPERSET of every φ-heavy key
    * whenever φ ≥ 1/(k+1). Decrement-all is amortized O(1): a
    * decrement round destroys k units of count and counts grow one
    * unit per arrival, so there are at most n/k rounds of O(k) work.
    *
    * Scale posture: state is ≤ k keys per partition (k·P keys total
    * on the wire — thousands, not the key domain), one pass, no
    * shuffle; exactly the shape that survives a 100 TB scan. */
  def mgCandidates(df: DataFrame, key: Column, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(key.cast("string").as("k")).filter(col("k").isNotNull)
      .as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { x =>
          counts.get(x) match {
            case Some(c) => counts(x) = c + 1
            case None if counts.size < k => counts(x) = 1L
            case None =>
              // in-place value updates are safe mid-iteration (no
              // structural change); removals are deferred past it
              val dead = List.newBuilder[String]
              counts.foreach { case (kk, c) =>
                if (c == 1L) dead += kk else counts(kk) = c - 1
              }
              dead.result().foreach(counts.remove)
          }
        }
        counts.keysIterator
      }
      .toDF("k").distinct()
  }

  /** Exact φ-heavy hitters via sketch-then-verify: Misra-Gries
    * candidate generation (bounded per-partition state, no false
    * negatives for φ ≥ 1/(k+1)) followed by an exact recount of the
    * candidates only, so false positives are filtered and the emitted
    * counts are EXACT — which is what makes the row oracle-checkable
    * against a plain GROUP BY ... HAVING even though a sketch did the
    * heavy lifting. φ is a rational `phiNum/phiDen` and the gate is
    * the cross-multiplied ALL-INTEGER compare `cnt·phiDen > N·phiNum`
    * — no float threshold to flip at a boundary.
    *
    * Scale posture: the candidate set (≤ k·P keys) broadcasts to a
    * semi-join, so the recount shuffles only candidate keys'
    * partial counts; the 1-row total broadcasts into the gate. */
  def heavyHitters(df: DataFrame, key: Column, phiNum: Long, phiDen: Long,
                   k: Int): DataFrame = {
    require(phiNum * (k + 1) >= phiDen,
      s"phi=$phiNum/$phiDen below the Misra-Gries guarantee 1/(k+1) for k=$k")
    val keys = df.select(key.cast("string").as("k")).filter(col("k").isNotNull)
    val cand = mgCandidates(df, key, k)
    val total = keys.agg(count(lit(1)).as("n_total"))
    keys.join(broadcast(cand), Seq("k"), "left_semi")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * phiDen > col("n_total") * phiNum)
      .select(col("k"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total").cast("double"), 4).as("share"))
      .orderBy(desc("cnt"), col("k"))
  }

  /** Driver row: event types holding > 10% share. The synthetic
    * domain is small, so the sketch is exact here — the planted-Zipf
    * SketchesSpec case is where candidate pruning actually bites. */
  def heavyHitterEventTypes(s: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables(s, dir, "events"), col("event_type"),
      phiNum = 1, phiDen = 10, k = 16)
      .withColumnRenamed("k", "event_type")

  private def kmvUsersOracleSql: String =
    s"""WITH du AS (SELECT DISTINCT user_id FROM events),
       |${OracleSql.m61FmixScalarCtes("du", "CAST(user_id AS VARCHAR)")},
       |hm AS (SELECT DISTINCT h & 9223372036854775807 AS hm FROM mh),
       |topk AS (SELECT hm FROM hm ORDER BY hm LIMIT 32),
       |agg AS (SELECT count(*) AS k_eff, max(hm) AS kth_hash FROM topk)
       |SELECT k_eff, kth_hash,
       |  ${OracleSql.round(
           "CASE WHEN k_eff < 32 THEN CAST(k_eff AS DOUBLE) ELSE 31.0 * 9223372036854775808.0 / CAST(kth_hash AS DOUBLE) END", 4)} AS est_users
       |FROM agg""".stripMargin

  /** Count-Min sketch (Cormode & Muthukrishnan '05) point estimates:
    * d=4 hash rows × w=64 counters; `est(u) = min_j counter[j][h_j(u)]`
    * with the one-sided guarantee est ≥ true (only overcounts —
    * collisions ADD). The row surfaces the sketch against the truth
    * for the `topn` heaviest users: (user_id, n_exact, est, overcount)
    * — overcount is fully deterministic given the data and the
    * M61+fmix hash family, so the whole construction hash-checks in
    * DuckDB (h_j(u) = hash63 of the stringified `u·d + j`, mirrored
    * with the HUGEINT scalar chain).
    *
    * Scale posture: the sketch build is ONE scan with a map-side-
    * combining groupBy whose key domain is d·w = 256 — per-partition
    * state is 256 counters regardless of corpus size (THE reason CMS
    * exists), and the merged sketch is 256 rows. The probe side joins
    * those 256 rows broadcast. */
  def cmsUserCounts(s: SparkSession, dir: String, w: Int = 64, d: Int = 4,
                    topn: Int = 20): DataFrame = {
    val ev = Tables(s, dir, "events")
    cmsProbe(cmsSketch(ev, w, d), ev, w, d, topn)
  }

  /** The d·w-row CMS counter frame over any (user_id) events frame —
    * works unchanged on a STREAMING frame (it is one groupBy count). */
  private def cmsSketch(ev: DataFrame, w: Int, d: Int): DataFrame =
    ev.select(col("user_id"), explode(cmsJs(d)).as("j"))
      .select(col("j"), cmsBucket(col("user_id"), col("j"), w, d).as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Point-estimate the `topn` heaviest users of `ev` against a built
    * counter frame: (user_id, n_exact, est, overcount). */
  private def cmsProbe(sketch: DataFrame, ev: DataFrame,
                       w: Int, d: Int, topn: Int): DataFrame = {
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
    val probes = exact.orderBy(desc("n_exact"), col("user_id")).limit(topn)
    probes.select(col("user_id"), col("n_exact"), explode(cmsJs(d)).as("j"))
      .withColumn("bucket", cmsBucket(col("user_id"), col("j"), w, d))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("c")).as("est"))
      .select(col("user_id"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
      .orderBy(desc("n_exact"), col("user_id"))
  }

  private def cmsJs(d: Int): Column = array((0 until d).map(lit): _*)

  private def cmsBucket(u: Column, j: Column, w: Int, d: Int): Column =
    hash63((u * d + j).cast("string")) % w

  /** [[cmsUserCounts]] with the SKETCH BUILD run through the real
    * Structured Streaming micro-batch engine — the continuously-
    * maintained frequency table an intake dashboard reads. Complete-
    * mode aggregation whose state is the d·w = 256 counter rows
    * REGARDLESS of stream length (the CMS point), RocksDB-backed; the
    * probe side (exact truth for the heaviest users) stays batch.
    * Like the streaming KMV row, the oracle is the batch row's
    * VERBATIM: counters are order-independent sums, so engine,
    * batching, and arrival order must all cancel — that equality is
    * the check. */
  def cmsUserCountsStreaming(s: SparkSession, dir: String, w: Int = 64,
                             d: Int = 4, topn: Int = 20): DataFrame = {
    val ev = Tables(s, dir, "events")
    val src = s.readStream.schema(ev.schema).parquet(s"$dir/events.parque[t]")
    val sketch = graft.streaming.StreamingPipeline.runOneShot(
      cmsSketch(src, w, d), "cms_stream", "complete", Seq("j", "bucket"))
    cmsProbe(sketch, ev, w, d, topn)
  }

  private def cmsUsersOracleSql: String =
    s"""WITH keys AS (SELECT user_id, j FROM events
       |             CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
       |${OracleSql.m61FmixScalarCtes("keys", "CAST(user_id * 4 + j AS VARCHAR)", p = "ch")},
       |sketch AS (SELECT j, (h & 9223372036854775807) % 64 AS bucket, count(*) AS c
       |           FROM ch GROUP BY 1, 2),
       |exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1),
       |probes AS (SELECT user_id, n_exact FROM exact
       |           ORDER BY n_exact DESC, user_id LIMIT 20),
       |pk AS (SELECT user_id, n_exact, j FROM probes
       |       CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
       |${OracleSql.m61FmixScalarCtes("pk", "CAST(user_id * 4 + j AS VARCHAR)", p = "ph")},
       |est AS (SELECT p.user_id, p.n_exact, min(s.c) AS est
       |        FROM (SELECT user_id, n_exact, j,
       |                (h & 9223372036854775807) % 64 AS bucket FROM ph) p
       |        JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
       |        GROUP BY 1, 2)
       |SELECT user_id, n_exact, est, est - n_exact AS overcount
       |FROM est ORDER BY n_exact DESC, user_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "sketch_cms_user_counts" -> QueryDef((s, d) => cmsUserCounts(s, d),
      Some(cmsUsersOracleSql),
      notes = "Count-Min point estimates vs exact truth for the 20 heaviest " +
        "users; deterministic M61+fmix bucket hashing, so overcounts " +
        "hash-check cross-engine"),
    // Shares the batch oracle VERBATIM: CMS counters are order-
    // independent sums, so engine, batching, and arrival order must
    // all cancel — that equality is the check (the KMV contract).
    "sketch_cms_user_counts_streaming" -> QueryDef(
      (s, d) => cmsUserCountsStreaming(s, d), Some(cmsUsersOracleSql),
      notes = "CMS sketch build through the micro-batch engine (complete-" +
        "mode 256-row state on RocksDB); probe side batch; batch oracle " +
        "shared verbatim"),
    "sketch_kmv_users" -> QueryDef((s, d) => kmvUserCardinality(s, d),
      Some(kmvUsersOracleSql)),
    // The streaming row shares the batch oracle VERBATIM: the k-min
    // set is a function of the input SET, so engine, batching, and
    // arrival order must all cancel — that equality is the check.
    "sketch_kmv_users_streaming" -> QueryDef(
      (s, d) => kmvUserCardinalityStreaming(s, d), Some(kmvUsersOracleSql)),
    "sketch_kmv_overlap" -> QueryDef((s, d) => kmvUserOverlap(s, d), Some {
      def side(tag: String, t: String) =
        s"""du$tag AS (SELECT DISTINCT user_id FROM events WHERE event_type = '$t'),
           |${OracleSql.m61FmixScalarCtes(s"du$tag", "CAST(user_id AS VARCHAR)", p = s"mh$tag")},
           |h$tag AS (SELECT DISTINCT h & 9223372036854775807 AS hm FROM mh$tag),
           |t$tag AS (SELECT hm FROM h$tag ORDER BY hm LIMIT 32),
           |e$tag AS (SELECT count(*) AS keff, max(hm) AS kth FROM t$tag)""".stripMargin
      def est(tag: String) = OracleSql.round(
        s"CASE WHEN (SELECT keff FROM e$tag) < 32 THEN CAST((SELECT keff FROM e$tag) AS DOUBLE) " +
          s"ELSE 31.0 * 9223372036854775808.0 / CAST((SELECT kth FROM e$tag) AS DOUBLE) END", 4)
      s"""WITH ${side("a", "click")},
         |${side("b", "purchase")},
         |tu AS (SELECT hm FROM (SELECT hm FROM ta UNION SELECT hm FROM tb)
         |       ORDER BY hm LIMIT 32),
         |eu AS (SELECT count(*) AS keff, max(hm) AS kth FROM tu),
         |sel AS (SELECT ${est("a")} AS est_a, ${est("b")} AS est_b,
         |               ${est("u")} AS est_union)
         |SELECT est_a, est_b, est_union,
         |  ${OracleSql.round("greatest(est_a + est_b - est_union, 0.0)", 4)} AS est_intersect
         |FROM sel""".stripMargin
    }),
    "heavy_hitter_event_types" -> QueryDef(heavyHitterEventTypes, Some(
      s"""WITH n AS (SELECT count(*) AS n_total FROM events WHERE event_type IS NOT NULL)
         |SELECT event_type, count(*) AS cnt,
         |  ${OracleSql.round("CAST(count(*) AS DOUBLE) / (SELECT CAST(n_total AS DOUBLE) FROM n)", 4)} AS share
         |FROM events WHERE event_type IS NOT NULL
         |GROUP BY event_type
         |HAVING count(*) * 10 > (SELECT n_total FROM n) * 1
         |ORDER BY cnt DESC, event_type""".stripMargin)))
}

/** ≤ k smallest distinct hashes, ascending (so the last element is
  * the k-th minimum). */
final case class KmvBuf(hs: Seq[Long])

/** The KMV sketch as a typed mergeable `Aggregator` — reduce inserts
  * one hash, merge unions two k-sets, both re-trim to the k smallest
  * DISTINCT values. Mergeability is the whole sketch (Beyer et al.
  * SIGMOD'07): Catalyst plans it partial→merge→final across
  * partitions, and Structured Streaming folds each micro-batch into
  * RocksDB state with the SAME merge — one implementation serves
  * batch, streaming, and any per-shard/per-day rollup at 100 TB.
  * Buffers are ≤ k longs; the per-row re-sort is O(k log k) with
  * k = 32, noise next to the scan. */
final class KmvAgg(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, KmvBuf] {
  import org.apache.spark.sql.{Encoder, Encoders}
  private def trim(a: Seq[Long], b: Seq[Long]): KmvBuf =
    KmvBuf((a ++ b).distinct.sorted.take(k))
  override def zero: KmvBuf = KmvBuf(Seq.empty)
  override def reduce(b: KmvBuf, h: Long): KmvBuf = trim(b.hs, Seq(h))
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = trim(a.hs, b.hs)
  override def finish(r: KmvBuf): KmvBuf = r
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
