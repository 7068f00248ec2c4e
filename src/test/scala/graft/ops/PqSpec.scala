package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ semantics on planted clusters: codebook shape, code validity,
  * exact-copy encoding agreement, and shortlist recall — plus the
  * ADC-vs-exact sanity that the rescore stage exists to provide. */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 16 clusters × 8 members, tight — same fixture family as IvfSpec. */
  lazy val clustered: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = for {
      c <- 0 until 16
      base = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 8
    } yield (c.toLong * 8 + m, base.map(x => x + 0.02 * rnd.nextGaussian()).toSeq)
    rows.toDF("id", "v")
  }

  test("codebooks: m subspaces, ksub centroids each, subDim-wide") {
    val model = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    assert(model.m == 4 && model.subDim == 16)
    assert(model.codebooks.forall(cb =>
      cb.length == 16 && cb.forall(_.length == 16)))
  }

  test("encoding: codes in range; near-identical vectors share codes") {
    val model = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    val enc = Pq.encode(clustered, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 16)))
    // members of the same tight cluster should usually agree per
    // subspace — check cluster 0's members share the majority code
    val cluster0 = (0L until 8L).map(enc)
    val agree = (0 until 4).count { j =>
      cluster0.map(_(j)).groupBy(identity).values.map(_.size).max >= 6
    }
    assert(agree >= 3, s"cluster members disagree on codes: $cluster0")
  }

  test("PQ top-1 recall ≈ 1 on planted clusters") {
    val model = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    val queries = clustered.filter(col("id") % 8 === 0)
    val corpus = clustered.filter(col("id") % 8 =!= 0)
    val top1 = Pq.pqTopK(queries, corpus, model, k = 5, shortlist = 20)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1.size == 16, s"got candidates for ${top1.size}/16 queries")
    val hits = top1.count { case (q, n) => n / 8 == q / 8 }
    assert(hits.toDouble / top1.size >= 0.95, s"$hits/${top1.size}")
  }

  test("persisted index: disk round-trip equals the in-memory path") {
    val model = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    val queries = clustered.filter(col("id") % 8 === 0)
    val corpus = clustered.filter(col("id") % 8 =!= 0)
    val path = "target/scratch/pq_index_spec"
    Pq.writeIndex(spark, corpus, model, path)
    val loaded = Pq.readModel(spark, path)
    assert(loaded.m == model.m && loaded.subDim == model.subDim)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val direct = Pq.pqTopK(queries, corpus, model, k = 5, shortlist = 20)
      .collect().toSeq
    val viaIndex = Pq.pqTopKFrom(queries,
      spark.read.parquet(s"$path/codes"), spark.read.parquet(s"$path/vectors"),
      loaded, k = 5, shortlist = 20).collect().toSeq
    assert(viaIndex == direct)
  }

  test("IVF-PQ composition: cell pruning + code ranking keeps recall on planted clusters") {
    val coarse = Ivf.train(clustered, k = 16, iters = 4)
    val pq = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    val queries = clustered.filter(col("id") % 8 === 0)
    val corpus = clustered.filter(col("id") % 8 =!= 0)
    val top1 = IvfPq.ivfPqTopK(queries, corpus, coarse, pq,
        k = 5, nprobe = 2, shortlist = 20)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1.size == 16, s"candidates for ${top1.size}/16 queries")
    val hits = top1.count { case (q, n) => n / 8 == q / 8 }
    assert(hits.toDouble / top1.size >= 0.95, s"$hits/${top1.size}")
  }

  test("persisted IVF-PQ index: equals the in-memory composition, cell-pruned scan") {
    val coarse = Ivf.train(clustered, k = 16, iters = 4)
    val pq = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    val queries = clustered.filter(col("id") % 8 === 0)
    val corpus = clustered.filter(col("id") % 8 =!= 0)
    val path = "target/scratch/ivfpq_index_spec"
    IvfPq.writeIndex(spark, corpus, coarse, pq, path)
    val direct = IvfPq.ivfPqTopK(queries, corpus, coarse, pq,
      k = 5, nprobe = 2, shortlist = 20).collect().toSeq
    val viaIndex = IvfPq.ivfPqTopKIndexed(spark, path, queries,
      k = 5, nprobe = 2, shortlist = 20)
    assert(viaIndex.collect().toSeq == direct)
    // the probed-cell literals must reach the CODE scan as a partition
    // filter — both pruning axes at once: partition pruning cuts rows,
    // the code-only projection cuts bytes
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"no cell partition pruning in plan:\n$plan")
  }

  test("rescore stage orders the shortlist by EXACT cosine, not ADC") {
    val model = Pq.train(clustered, m = 4, ksub = 16, iters = 2)
    val queries = clustered.filter(col("id") === 0)
    val corpus = clustered.filter(col("id") =!= 0)
    val got = Pq.pqTopK(queries, corpus, model, k = 10, shortlist = 40)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // sims must be non-increasing in rank (exact cosine ordering)
    val sims = got.sortBy(_._3).map(_._2)
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"${sims.toSeq}")
  }
}
