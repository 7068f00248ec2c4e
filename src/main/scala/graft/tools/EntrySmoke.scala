package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // deliberately a PLAIN session — no nanosAsLong, no extensions —
    // exactly what the driver's smoke check may construct
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    require(n > 0)
    spark.stop()
  }
}
