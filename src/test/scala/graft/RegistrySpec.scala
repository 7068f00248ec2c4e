package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: `SparkEntry.all` is built by concatenating
  * per-module maps, where a duplicated query name would silently drop
  * one implementation (last-wins). */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across modules") {
    val modules = Seq(
      "EventQueries" -> ops.EventQueries.defs,
      "TpchQueries" -> ops.TpchQueries.defs,
      "Dedup" -> ops.Dedup.defs,
      "TextAnalysis" -> ops.TextAnalysis.defs,
      "Similarity" -> ops.Similarity.defs,
      "Multimodal" -> ops.Multimodal.defs,
      "AsofJoin" -> ops.AsofJoin.defs,
      "RangeJoin" -> ops.RangeJoin.defs,
      "Ivf" -> ops.Ivf.defs,
      "Pipelines" -> ops.Pipelines.defs,
      "Sampling" -> ops.Sampling.defs,
      "Sketches" -> ops.Sketches.defs,
      "Curation" -> ops.Curation.defs,
      "Scrub" -> ops.Scrub.defs,
      "Retrieval" -> ops.Retrieval.defs,
      "DataQuality" -> ops.DataQuality.defs,
      "KdcParseQueries" -> kdc.KdcParseQueries.defs)
    val perModule = modules.map(_._2.size).sum
    assert(SparkEntry.all.size == perModule,
      s"collision: ${perModule - SparkEntry.all.size} shadowed names — " +
        modules.flatMap(_._2.keys).groupBy(identity)
          .collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    // the assembled map is what SparkEntry.all concatenates — catch a
    // module added to the codebase but forgotten in SparkEntry
    assert(modules.map(_._2.size).sum == SparkEntry.all.size)
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
