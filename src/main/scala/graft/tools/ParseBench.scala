package graft.tools
import org.apache.spark.sql.SparkSession
import graft.kdc._
object ParseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = args(0)
    // warmup
    KdcSource.records(spark, path).count()
    var t0 = System.nanoTime()
    val n1 = KdcSource.records(spark, path).count()
    println(f"PARSE shuffle-by-file: $n1 sessions in ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n2 = KdcSource.recordsAligned(spark, path).count()
    println(f"PARSE split-aligned:   $n2 sessions in ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n3 = KdcSource.recordsAligned(spark, path, Some(8L*1024*1024)).count()
    println(f"PARSE aligned(8MB):    $n3 sessions in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
