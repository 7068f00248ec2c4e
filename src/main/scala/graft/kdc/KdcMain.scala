package graft.kdc

import org.apache.spark.sql.SparkSession

/** CLI entry: raw Heimdal KDC logs → per-user TSV, the Spark
  * re-expression of the reference's `UserTimeRunner` job
  * (`/root/reference/.../UserTimeRunner.java:34-48`; output format
  * `user \t firstts \t lastts \t count` per `UserTimeRec.java:128-130`,
  * with the corrected min/max semantics — SURVEY.md §2.4).
  *
  * Usage: KdcMain <input logs (file/dir/glob)> <output dir> [realm] [--aligned]
  *
  * `--aligned` selects the zero-shuffle split-aligned source
  * ([[KdcSource.recordsAligned]]) — best for few huge files; default
  * is shuffle-by-file ([[KdcSource.records]]) — simplest for fleets.
  */
object KdcMain {
  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val aligned = flags.contains("--aligned")
    require(positional.length >= 2, "usage: KdcMain <input> <outdir> [realm] [--aligned]")
    val Array(in, out) = positional.take(2)
    val realm = positional.lift(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("kdc-user-time")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val source = if (aligned) KdcSource.recordsAligned(spark, in)
                 else KdcSource.records(spark, in)
    val recs = KdcQueries.withCounters(source)
    KdcQueries.userAuthStats(recs, realm)
      .select("client", "first_ts", "last_ts", "n_auth")
      .write.option("sep", "\t").mode("overwrite").csv(out)
    spark.stop()
  }
}
