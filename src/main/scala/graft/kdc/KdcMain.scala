package graft.kdc

import org.apache.spark.sql.SparkSession

/** CLI entry: raw Heimdal KDC logs → per-user TSV, the Spark
  * re-expression of the reference's `UserTimeRunner` job
  * (`/root/reference/.../UserTimeRunner.java:34-48`; output format
  * `user \t firstts \t lastts \t count` per `UserTimeRec.java:128-130`,
  * with the corrected min/max semantics — SURVEY.md §2.4).
  *
  * Usage: KdcMain <input logs (file/dir/glob)> <output dir> [realm]
  */
object KdcMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: KdcMain <input> <outdir> [realm]")
    val Array(in, out) = args.take(2)
    val realm = args.lift(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("kdc-user-time")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = KdcQueries.withCounters(KdcSource.records(spark, in))
    KdcQueries.userAuthStats(recs, realm)
      .select("client", "first_ts", "last_ts", "n_auth")
      .write.option("sep", "\t").mode("overwrite").csv(out)
    spark.stop()
  }
}
