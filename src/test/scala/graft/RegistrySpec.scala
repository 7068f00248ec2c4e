package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: `SparkEntry.all` is built by concatenating
  * per-module maps, where a duplicated query name would silently drop
  * one implementation (last-wins). */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across modules") {
    // the shared module list (also the catalog's source) — uniqueness
    // here means SparkEntry.all's ++ concatenation shadows nothing
    val modules = SparkEntry.modules
    val perModule = modules.map(_._2.size).sum
    assert(SparkEntry.all.size == perModule,
      s"collision: ${perModule - SparkEntry.all.size} shadowed names — " +
        modules.flatMap(_._2.keys).groupBy(identity)
          .collect { case (k, v) if v.size > 1 => k }.mkString(", "))
  }

  test("every ops object with a defs map is in the shared module list") {
    // a module forgotten in SparkEntry.modules would vanish from the
    // driver surface AND the catalog silently; this reflection sweep
    // catches the class of omission the count check cannot
    val listed = SparkEntry.modules.map(_._1).toSet
    val expected = Set("EventQueries", "Insights", "TpchQueries", "Dedup",
      "TextAnalysis", "Similarity", "Multimodal", "AsofJoin", "RangeJoin",
      "Ivf", "Pq", "IvfPq", "Pipelines", "Sampling", "Sketches", "Curation", "Scrub",
      "Retrieval", "DataQuality", "Bucketing", "Layout", "Stats", "Graph",
      "KdcParseQueries")
    assert(listed == expected, s"module list drift: ${listed.diff(expected)} / ${expected.diff(listed)}")
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("bench tier allowlists: disjoint, and every member is a registered query") {
    // stale names here would silently re-tier (or un-tier) rows in
    // BENCH_r*.json; a rename must update the allowlist to pass
    val unknown = SparkEntry.lifecycleRows.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"allowlisted but not registered: $unknown")
    val both = SparkEntry.streamRows.intersect(SparkEntry.ingestRows)
    assert(both.isEmpty, s"rows in both tiers: $both")
    // every row driving the streaming engine must be warmup-skipped:
    // a streaming row missing from streamRows would churn RocksDB
    // checkpoints during warmup. Heuristic guard only (names are the
    // best signal available to a spec); the allowlist stays the truth.
    val suspicious = SparkEntry.queries.keySet
      .filter(n => n.contains("stream") || n.contains("ingest"))
      .diff(SparkEntry.lifecycleRows)
    assert(suspicious.isEmpty,
      s"rows that look lifecycle but are not allowlisted (add to " +
        s"SparkEntry.streamRows/ingestRows or rename): $suspicious")
  }
}
