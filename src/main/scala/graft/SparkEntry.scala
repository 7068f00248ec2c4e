package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-concern registries:
  *  - [[graft.ops.EventQueries]] — the reference's seven README query
  *    shapes on the `events` table (SURVEY.md §2.2/§2.4-2.6)
  *  - [[graft.ops.TpchQueries]] — joins/set-ops/rollup/scalar surface
  *    on the star schema (SURVEY.md §2.3/§2.7/§2.8)
  *  - [[graft.kdc.KdcParseQueries]] — the raw-log parsing pipeline
  *    itself, driven over an embedded fixture with literal VALUES
  *    oracles (`kdc_parse_user_stats` / `kdc_parse_service_stats` /
  *    `kdc_parse_errors`), on top of its golden/property ScalaTests
  */
object SparkEntry {

  /** The ONE module list — `all`, the generated catalog
    * (tools.CatalogDump) and the registry-integrity spec all derive
    * from it, so a module added here appears everywhere and a module
    * forgotten here appears nowhere (instead of silently diverging
    * between surfaces). */
  def modules: Seq[(String, Map[String, QueryDef])] = Seq(
    "EventQueries" -> ops.EventQueries.defs,
    "Insights" -> ops.Insights.defs,
    "TpchQueries" -> ops.TpchQueries.defs,
    "Dedup" -> ops.Dedup.defs,
    "TextAnalysis" -> ops.TextAnalysis.defs,
    "Similarity" -> ops.Similarity.defs,
    "Multimodal" -> ops.Multimodal.defs,
    "AsofJoin" -> ops.AsofJoin.defs,
    "RangeJoin" -> ops.RangeJoin.defs,
    "Ivf" -> ops.Ivf.defs,
    "Pq" -> ops.Pq.defs,
    "IvfPq" -> ops.IvfPq.defs,
    "Pipelines" -> ops.Pipelines.defs,
    "Sampling" -> ops.Sampling.defs,
    "Sketches" -> ops.Sketches.defs,
    "Curation" -> ops.Curation.defs,
    "Scrub" -> ops.Scrub.defs,
    "Retrieval" -> ops.Retrieval.defs,
    "DataQuality" -> ops.DataQuality.defs,
    "Bucketing" -> ops.Bucketing.defs,
    "Layout" -> ops.Layout.defs,
    "Stats" -> ops.Stats.defs,
    "Graph" -> ops.Graph.defs,
    "KdcParseQueries" -> kdc.KdcParseQueries.defs)

  def all: Map[String, QueryDef] =
    modules.map(_._2).reduce(_ ++ _)

  /** Bench-tier taxonomy — EXPLICIT name sets, not substring matches
    * (a future row named e.g. `downstream_latency` must not silently
    * change tiers; RegistrySpec pins every member to a registered
    * query).
    *
    * `streamRows` run the real micro-batch engine per invocation
    * (RocksDB state, checkpoint lifecycle) — their cost is engine
    * lifecycle, not JIT, so Bench also skips their warmup pass.
    * `ingestRows` build a persisted index/layout inline per invocation
    * (an amortized-per-ingest cost in production): the dedup ingest
    * loops and the bucketed-PageRank layout write
    * (`supplier_pagerank_layout` — the write moved to its own row in
    * round 11 so `supplier_pagerank_bucketed` times the amortized
    * rounds-over-existing-layout path in the QUERY tier, which is what
    * a deployment runs per query). */
  val streamRows: Set[String] = Set(
    "ann_ivf_append_streaming", "daily_user_activity_streaming",
    "dedup_exact_streaming", "dedup_ingest_streaming",
    "event_transition_matrix_streaming", "kdc_parse_service_stats_streaming",
    "kdc_parse_user_stats_streaming", "kdc_parse_user_stats_v2_streaming",
    "kdc_parse_user_stats_v2_watermarked",
    "session_timeout_stats_streaming",
    "session_window_stats_streaming", "sketch_cms_user_counts_streaming",
    "sketch_kmv_users_streaming",
    "stream_dedup_delivery", "stream_interval_join", "stream_outer_join",
    "stream_static_enrich", "top_users_streaming",
    "user_first_last_streaming_stateful")

  val ingestRows: Set[String] = Set(
    "dedup_ingest_epochs", "dedup_ingest_epochs_auto",
    "dedup_ingest_epochs_batched", "dedup_ingest_indexed",
    "dedup_ingest_verdicts", "supplier_pagerank_layout")

  /** Rows whose wall time is lifecycle (index build / engine run), not
    * query latency — reported in Bench's `total_lifecycle` tier. */
  def lifecycleRows: Set[String] = streamRows ++ ingestRows

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Deliberately avoids the events table: the driver may call this with
    * its own SparkSession, and nanosecond vintages of events.parquet
    * need the `nanosAsLong` legacy flag our builders set (Verify/Bench). */
  def entry(spark: SparkSession): DataFrame =
    ops.TpchQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
