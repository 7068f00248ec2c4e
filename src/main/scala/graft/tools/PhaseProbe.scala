package graft.tools
import org.apache.spark.sql.SparkSession

/** Optimization-round forensics: split each query's wall time into
  * (a) frame construction (any eager driver work an operator does while
  * building the plan — collects, iterative loops), (b) analysis +
  * optimization + initial physical planning (`executedPlan` forced),
  * (c) execution through the noop sink. At bench scale (sf0.1 is ~17 MB
  * of parquet) driver-side planning of very large composed plans can
  * rival execution itself (guide §7.3) — this tool is how we find out
  * per query instead of guessing. Each query runs TWICE; both samples
  * print (first carries cold-codegen noise, second is steady-state).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.Tables(spark, dir, "lineitem").count() // session warmup
    for (name <- args; it <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis→physical planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"PHASE $name it=$it construct=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
        f"total=${(t3 - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    graft.ops.Graph.dropCachedLayouts(spark)
    spark.stop()
  }
}
