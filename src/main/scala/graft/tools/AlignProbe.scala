package graft.tools
import org.apache.spark.sql.SparkSession
object AlignProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = args(0)
    val lines = scala.io.Source.fromFile(args(0)).getLines().toSeq
    val expected = graft.kdc.Sessionizer.sessionize(lines.iterator).size
    println(s"PROBE expected=$expected")
    for (sz <- Seq(777L, 1500L, 2048L, 4096L, 65536L)) {
      val n = graft.kdc.KdcSource.recordsAligned(spark, path, Some(sz)).count()
      println(s"PROBE splitSize=$sz n=$n")
    }
    spark.stop()
  }
}
