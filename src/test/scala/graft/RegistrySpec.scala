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
}
