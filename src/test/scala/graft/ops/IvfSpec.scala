package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 16 clusters × 8 members, tight (2% noise) — IVF's home turf. */
  lazy val clustered: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = for {
      c <- 0 until 16
      base = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 8
    } yield (c.toLong * 8 + m, base.map(x => x + 0.02 * rnd.nextGaussian()).toSeq)
    rows.toDF("id", "v")
  }

  test("mini-Lloyd training converges to per-cluster cells") {
    val model = Ivf.train(clustered, k = 16, iters = 4)
    assert(model.k == 16)
    assert(model.centroids.forall(_.length == 64))
  }

  test("IVF top-1 recall ≈ 1 on planted clusters") {
    val model = Ivf.train(clustered, k = 16, iters = 4)
    val queries = clustered.filter(col("id") % 8 === 0)
    val corpus = clustered.filter(col("id") % 8 =!= 0)
    val top1 = Ivf.ivfTopK(queries, corpus, model, k = 5, nprobe = 2)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1.size == 16, s"got candidates for ${top1.size}/16 queries")
    val hits = top1.count { case (q, n) => n / 8 == q / 8 }
    assert(hits.toDouble / top1.size >= 0.95, s"$hits/${top1.size}")
  }

  test("persisted index: same results as in-memory model, pruned scan") {
    val model = Ivf.train(clustered, k = 16, iters = 4)
    val queries = clustered.filter(col("id") % 8 === 0)
    val corpus = clustered.filter(col("id") % 8 =!= 0)
    val path = "target/scratch/ivf_index"
    Ivf.writeIndex(spark, corpus, model, path)

    val direct = Ivf.ivfTopK(queries, corpus, model, k = 5, nprobe = 2)
      .collect().toSeq
    val viaIndex = Ivf.ivfTopKIndexed(spark, path, queries, k = 5, nprobe = 2)
    assert(viaIndex.collect().toSeq == direct)

    // the probed-cell filter must reach the scan as a PARTITION filter
    // (that is the whole point of the cid-partitioned layout: disk I/O
    // is ~nprobe/k of the corpus)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cid""".r.findFirstIn(plan).isDefined,
      s"no cid partition pruning in plan:\n$plan")
  }

  test("driver-table query emits k rows per query") {
    val df = Ivf.ivfQuery(spark, "/root/testdata/sf0.001").collect()
    val perQuery = df.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(perQuery.values.forall(_ == 10))
  }
}
