package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout helpers: pre-shuffle fact tables once at write
  * time so every subsequent equi-join/aggregation on the bucket key
  * runs with NO exchange.
  *
  * At 100 TB this is the difference between shuffling the fact table
  * per query and shuffling it once per ingest: a lineitem⋈orders on
  * orderkey over tables bucketed by orderkey is a zero-exchange
  * sort-merge join (BucketingSpec pins the absence of
  * ShuffleExchange in the physical plan). Bucket count is chosen at
  * ingest to keep per-bucket bytes within one task's budget at the
  * target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * sort-merge joins skip the sort too). Idempotent: drops the table
    * and any orphaned location first (an in-memory catalog forgets
    * tables across sessions but their directories survive). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket the two standard fact tables by order key. */
  def bucketFacts(s: SparkSession, dir: String, buckets: Int = 8): Unit = {
    writeBucketed(graft.Tables(s, dir, "lineitem"), "lineitem_b", "l_orderkey", buckets)
    writeBucketed(graft.Tables(s, dir, "orders"), "orders_b", "o_orderkey", buckets)
  }

  /** The Q3-shape revenue join over the bucketed tables — plans with
    * zero exchanges when both sides share the bucket spec. */
  def bucketedOrderRevenue(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    s.table("lineitem_b")
      .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderkey"))
  }
}
