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
