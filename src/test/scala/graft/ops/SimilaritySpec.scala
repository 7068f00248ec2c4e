package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LSH quality is validated on planted clusters (noisy copies of base
  * vectors, pairwise cosine ≈ 0.99) — the regime LSH exists for; the
  * driver testdata embeddings are near-random (max pair cosine 0.51),
  * which exercises plumbing but not recall. */
class SimilaritySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 20 clusters × 6 members: base gaussian + 3% noise. */
  lazy val clustered: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      c <- 0 until 20
      base = Array.fill(64)(rnd.nextGaussian())
      m <- 0 until 6
    } yield (c.toLong * 6 + m,
      base.map(x => x + 0.03 * rnd.nextGaussian()).toSeq)
    rows.toDF("id", "v")
  }

  test("brute-force top-k: k rows per query, descending sim") {
    val df = Similarity.bruteForceTopK(spark, dir).collect()
    assert(df.length == 50)
    val perQuery = df.groupBy(_.getLong(0))
    for ((_, rows) <- perQuery) {
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-1 recall ≈ 1 on planted clusters") {
    val queries = clustered.filter(col("id") % 6 === 0)
    val corpus = clustered.filter(col("id") % 6 =!= 0)
    val lsh = Similarity.lshTopKOn(queries, corpus, k = 5)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // each query's nearest neighbor must be a member of its own cluster
    val hits = lsh.count { case (q, n) => n / 6 == q / 6 }
    assert(lsh.size >= 19, s"only ${lsh.size} queries got any candidate")
    assert(hits.toDouble / lsh.size >= 0.95, s"$hits/${lsh.size}")
  }

  test("LSH near-dup pairs find planted cluster pairs with precision 1") {
    val pairs = Similarity.neardupPairsOn(clustered, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // precision: every reported pair is intra-cluster
    assert(pairs.forall { case (a, b) => a / 6 == b / 6 })
    // recall: 20 clusters × C(6,2)=15 pairs = 300 total
    assert(pairs.length >= 270, s"recall too low: ${pairs.length}/300")
  }

  test("autoBits keeps LSH candidate volume ~linear across corpus sizes") {
    // formula pins, three regimes (occupancy = n/2^bits NEVER above 64):
    // tiny (n < 2^10): log₂n − 2, occupancy ≈ 4; mid band
    // (2^10 ≤ n < 2^14): bits pinned at 8 (256 buckets), occupancy
    // shades 4 → 64 meeting the knee exactly; past the knee:
    // log₂n − 6, occupancy pinned at 64. The round-8
    // occupancy-64-everywhere dial coarsened small corpora 8× for no
    // asymptotic gain; the round-7 floor-8 plateau let occupancy grow
    // unboundedly past 2^16 — this dial is the envelope of both.
    assert(Similarity.autoBits(120) == 5)        // tiny: occupancy ~4
    assert(Similarity.autoBits(1000) == 8)       // mid band: 256 buckets
    assert(Similarity.autoBits(2000) == 8)       // sf0.1 embeddings point
    assert(Similarity.autoBits(1L << 14) == 8)   // the knee: both lines meet
    assert(Similarity.autoBits(20000) == 9)      // 10×-probe point unchanged
    assert(Similarity.autoBits(1L << 16) == 10)
    assert(Similarity.autoBits(1L << 20) == 14)
    assert(Similarity.autoBits(1L << 30) == 24)
    val tables = 2
    // Σ c(c-1)/2 over (tbl, bucket) = exact candidate-pair volume of
    // the bucket self-join, computed from the histogram (no join)
    def candVolume(n: Int, bits: Int): Long = {
      val vecs = spark.range(0, n, 1, 8)
        .select(col("id"), array((0 until 8).map(i => randn(42 + i)): _*).as("v"))
      Similarity.lshBuckets(vecs, "id", nTables = tables, nBits = bits, dims = 8)
        .groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head().getLong(0)
    }
    // balanced buckets give ≈ 128·n·tables; allow 8× for sign-LSH
    // bucket imbalance — the point is the bound is LINEAR in n
    for (n <- Seq(4096, 1 << 18)) {
      val vol = candVolume(n, Similarity.autoBits(n))
      assert(vol <= 1024L * n * tables,
        s"n=$n: candidate volume $vol exceeds linear bound ${1024L * n * tables}")
    }
    // constant 8 bits at the larger corpus blows past the auto-sized
    // volume — the quadratic creep autoBits exists to stop
    val big = 1 << 18
    assert(candVolume(big, 8) > 2 * candVolume(big, Similarity.autoBits(big)))
  }

  test("autoTables holds pair recall as autoBits coarsens buckets") {
    // formula pins: T(b) = ln(1-0.98)/ln(1-0.9^b), floored at 8
    assert(Similarity.autoTables(8) == 8)   // raw 6.95 → floor
    assert(Similarity.autoTables(12) == 12)
    assert(Similarity.autoTables(16) == 20)
    // recall in the AUTO-SCALED regime (bits above the floor-8 case
    // the historical default was tuned on): planted clusters at
    // bits = 12, tables auto-derived (12). At the planted cosine
    // ≈ 0.99 the per-pair analytic recall is ≈ 1 - 3e-5; the old
    // FIXED 8 tables at these bits would already sit near its recall
    // knee. 20 clusters × C(6,2) = 300 planted pairs.
    val pairs = Similarity.neardupPairsOn(clustered, threshold = 0.9,
        nTables = -1, nBits = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a / 6 == b / 6 }) // precision 1
    assert(pairs.length >= 285, s"auto-scaled recall too low: ${pairs.length}/300")
  }

  test("semantic decontamination: a planted eval copy flags at cosine 1, orthogonal content passes") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("semdec").toString
    // eval = vec 0 along e1; corpus: 20 = exact eval copy (scaled),
    // 21 = orthogonal, 22 = 45° (cos ≈ 0.7071 < 0.9)
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (20L, Array(3f, 0f, 0f, 0f), 0),
      (21L, Array(0f, 2f, 0f, 0f), 0),
      (22L, Array(1f, 1f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.semanticDecontamination(spark, tmp, nEval = 20)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got(20L) == ((1.0, true)), s"exact copy: ${got(20L)}")
    assert(got(21L) == ((0.0, false)), s"orthogonal: ${got(21L)}")
    assert(math.abs(got(22L)._1 - 0.707107) < 1e-6 && !got(22L)._2, s"${got(22L)}")
  }

  test("whitening: rank-1 cloud collapses to zero residual, projections recover the scale") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("whiten").toString
    // x = t·(1, 2, 0, 0), zero mean: everything lives along the one
    // component, so removing it leaves nothing — norm_after ≈ 0 and
    // |p1| = |x| = |t|·√5 exactly
    val ts = Seq(-3f, -2f, -1f, 1f, 2f, 3f)
    ts.zipWithIndex.map { case (t, i) => (i.toLong, Array(t, 2 * t, 0f, 0f), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.embeddingWhitening(spark, tmp, k = 1).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    ts.zipWithIndex.foreach { case (t, i) =>
      val (nb, na, p1) = got(i.toLong)
      assert(math.abs(nb - math.abs(t) * math.sqrt(5)) < 1e-5, s"norm_before $i: $nb")
      assert(na < 1e-5, s"rank-1 residual must vanish, got $na for vec $i")
      assert(math.abs(math.abs(p1) - math.abs(t) * math.sqrt(5)) < 1e-5, s"p1 $i: $p1")
    }
    // real corpus: removing projections never increases the norm
    // (components near-orthonormal; tolerance for 6-iter estimates)
    val real = Similarity.embeddingWhitening(spark, dir).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getDouble(2) <= r.getDouble(1) + 1e-4),
      "norm_after exceeded norm_before")
  }

  test("pcaTopK: component 1 ≡ pcaPower, spectrum descending, deflation near-orthogonal") {
    import org.apache.spark.sql.functions._
    val topk = Similarity.pcaTopK(spark, dir, k = 3).collect()
    assert(topk.length == 3 * 64)
    // component 1 runs the IDENTICAL loop on the identical staged cov
    val one = Similarity.pcaPower(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val c1 = topk.filter(_.getInt(0) == 1)
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(c1 == one, "top-k component 1 diverged from the single-component row")
    // deflation removes λ·vvᵀ, so each residual's top eigenvalue can
    // only shrink (Rayleigh estimates; tiny tolerance for 6-iteration
    // convergence error)
    val eigs = topk.groupBy(_.getInt(0)).view.mapValues(_.head.getDouble(3))
      .toSeq.sortBy(_._1).map(_._2)
    assert(eigs.zip(eigs.tail).forall { case (a, b) => b <= a + 1e-3 },
      s"eigenvalues not descending: $eigs")
    // successive components are near-orthogonal (exact orthogonality
    // needs converged estimates; near-random spectra converge slowly)
    def vec(c: Int): Array[Double] = topk.filter(_.getInt(0) == c)
      .sortBy(_.getLong(1)).map(_.getDouble(2))
    val dot12 = vec(1).zip(vec(2)).map { case (a, b) => a * b }.sum
    val dot13 = vec(1).zip(vec(3)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 0.3 && math.abs(dot13) < 0.3,
      s"components not near-orthogonal: v1·v2=$dot12 v1·v3=$dot13")
  }

  test("int8 quantization: bounded round-trip error, top-k ranks ≈ float path") {
    import org.apache.spark.sql.functions._
    // per-component dequantization error ≤ scale/2 = maxabs/254
    val err = Similarity.withQuantized(clustered)
      .select(max(expr(
        """array_max(zip_with(v, zip_with(q, array_repeat(scale, size(q)), (a, b) -> a * b),
          |  (x, d) -> abs(x - d))) / maxabs""".stripMargin)))
      .head().getDouble(0)
    assert(err <= 0.5 / 127 + 1e-12, s"round-trip error $err")
    // quantized top-1 neighbor matches the float top-1 for ≥ 80% of
    // queries (the driver embeddings are near-random, so top-1 margins
    // can sit inside the quantization step; on real clustered data
    // agreement is ~1)
    val floatTop = Similarity.bruteForceTopK(spark, dir).filter(col("rnk") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val qTop = Similarity.quantizedTopK(spark, dir).filter(col("rnk") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val agree = floatTop.count { case (q, n) => qTop.get(q).contains(n) }
    assert(agree.toDouble / floatTop.size >= 0.8,
      s"quantized top-1 agreement $agree/${floatTop.size}")
  }

  test("semanticDedup: duplicate groups collapse to the min id, distinct groups survive") {
    import spark.implicits._
    // two orthogonal duplicate-groups: pruning must keep exactly the
    // min id of each, regardless of how the hash-picked seeds cluster
    // them (cross-group cosine is 0, within-group exactly 1)
    val u = Seq(1.0, 0.0, 0.0, 0.0)
    val v = Seq(0.0, 1.0, 0.0, 0.0)
    val vecs = Seq((1L, u), (2L, u), (3L, u), (4L, v), (5L, v), (6L, v))
      .toDF("vec_id", "v")
    val kept = Similarity.semanticDedupOn(vecs, k = 2, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"kept $kept")
    // a threshold above 1 can prune nothing
    val all = Similarity.semanticDedupOn(vecs, k = 2, threshold = 1.1).count()
    assert(all == 6)
  }

  test("semanticDedup on planted clusters prunes most near-copies") {
    val vecs = clustered.select(col("id").as("vec_id"), col("v"))
    val kept = Similarity.semanticDedupOn(vecs, k = 8, threshold = 0.9).count()
    // 20 clusters of 6 near-identical members: within-cell pruning must
    // collapse most of each cluster (co-clustered members prune to few
    // exemplars; a perfect partition would leave exactly 20)
    assert(kept >= 20 && kept <= 45, s"kept $kept of 120")
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(64)(0.5))).toDF("id", "v")
    val c = df.select(Similarity.cosine(col("v"), col("v"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("native codegen cosine is bit-identical to the HOF fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} hof=${r.getDouble(1)}"))
  }

  test("seeded IVF: exhaustive probe equals brute force; 2-probe recall is useful") {
    def pairs(df: DataFrame) = df.select("query_id", "neighbor_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = pairs(Similarity.bruteForceTopK(spark, dir))
    // probing every cell makes the candidate set the whole corpus —
    // the result must be EXACTLY brute force, ranks included (the
    // mechanics check: partition + probe + rank lose nothing)
    val all = pairs(Similarity.seededIvfTopK(spark, dir, nProbe = 8))
    assert(all == brute, s"missing=${brute -- all} extra=${all -- brute}")
    // the default 2-of-8-cell probe on UNclustered random embeddings
    // (the hardest case for IVF) still recovers a useful fraction
    val two = Similarity.seededIvfTopK(spark, dir).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (two & bruteIds).size.toDouble / bruteIds.size
    assert(recall >= 0.4, s"2-probe recall $recall collapsed")
  }

  test("vector functions usable from SQL after registration") {
    graft.functions.vectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, l2_norm(array(3.0d, 4.0d)) n")
      .head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 5.0)
  }

  test("contrastive mining: hard negative is the closest impostor, hard positive the farthest classmate") {
    import spark.implicits._
    def at(deg: Double): Seq[Double] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r)) ++ Seq.fill(62)(0.0)
    }
    // query 0 (label 0) at 0°; same-label corpus at 10° and 60° → hard
    // positive = 60° (farthest classmate); other-label corpus at 20°
    // and 90° → hard negative = 20° (closest impostor)
    val rows = Seq(
      (0L, 0, at(0)),
      (20L, 0, at(10)), (21L, 0, at(60)),
      (22L, 1, at(20)), (23L, 1, at(90)))
    val got = Similarity.contrastivePairsOn(rows.toDF("vec_id", "label", "v"), nQueries = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 0, 22L, 21L)), s"${got.toSeq}")
  }

  test("truncation recall: a tail-heavy impostor wins the prefix ranking") {
    import spark.implicits._
    def vec(parts: (Int, Double)*): Seq[Double] = {
      val a = Array.fill(64)(0.0)
      parts.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    // query 0 = axis0. v1 (id 10) ≈ query inside the 16-dim prefix
    // (cos 5°); v2 (id 11) has a PERFECT prefix but a big tail away
    // from it (full cosine 1/sqrt(26)); v3 (id 12) orthogonal.
    // Full ranking: v1 > v2 > v3. Prefix ranking: v2 > v1 > v3.
    val r5 = math.toRadians(5)
    val rows = Seq(
      (0L, vec(0 -> 1.0)),
      (10L, vec(0 -> math.cos(r5), 1 -> math.sin(r5))),
      (11L, vec(0 -> 1.0, 20 -> 5.0)),
      (12L, vec(2 -> 1.0)))
    val df = rows.toDF("vec_id", "v")
    val k1 = Similarity.truncationRecallOn(df, nQueries = 1, k = 1, dims = 16)
      .collect().head
    assert((k1.getLong(2), k1.getDouble(3)) == ((0L, 0.0)),
      s"k=1 must lose the top hit to the prefix impostor: $k1")
    val k2 = Similarity.truncationRecallOn(df, nQueries = 1, k = 2, dims = 16)
      .collect().head
    assert((k2.getLong(2), k2.getDouble(3)) == ((2L, 1.0)),
      s"k=2 re-covers both: $k2")
  }

  test("DBSCAN: planted clusters become cores, stragglers borders, outliers noise") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val baseA = Array.fill(64)(rnd.nextGaussian())
    val baseB = Array.fill(64)(rnd.nextGaussian())
    def noisy(base: Array[Double], amt: Double) =
      base.map(x => x + amt * rnd.nextGaussian()).toSeq
    // ids 0-4: tight cluster A; 10-14: tight cluster B (cosine ≈ 0.99
    // within, the regime LSH recall ≈ 1); 20: a straggler still close
    // to A but with < minPts neighbors of its own is NOT guaranteed —
    // instead plant the textbook border: close to exactly the A
    // members (one noisy copy at larger noise); 30-31: isolated noise
    val rows =
      (0L to 4L).map(i => (i, noisy(baseA, 0.03))) ++
      (10L to 14L).map(i => (i, noisy(baseB, 0.03))) ++
      Seq((30L, Array.fill(64)(rnd.nextGaussian()).toSeq),
        (31L, Array.fill(64)(rnd.nextGaussian()).toSeq))
    val got = Similarity.dbscanClustersOn(rows.toDF("id", "v"), eps = 0.8, minPts = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    (0L to 4L).foreach(i => assert(got(i) == ((0L, "core")), s"$i -> ${got(i)}"))
    (10L to 14L).foreach(i => assert(got(i) == ((10L, "core")), s"$i -> ${got(i)}"))
    Seq(30L, 31L).foreach(i => assert(got(i) == ((-1L, "noise")), s"$i -> ${got(i)}"))
  }

  test("DBSCAN: border role attaches to the smallest adjacent cluster") {
    import spark.implicits._
    // planar fan at explicit angles (eps = 0.94 ≈ 20°): A0 at 0°, A1
    // at 9°, A2 at −9° are mutually adjacent (max gap 18° → cos 0.951);
    // P at 28.5° reaches ONLY A1 (19.5° → cos 0.943; 28.5° to A0 →
    // 0.879 < eps). At minPts = 2, A0/A1/A2 are cores, P has one
    // neighbor ⇒ border, attached through A1 to component-min 0. An
    // orthogonal point has no neighbors ⇒ noise. Identical copies
    // cannot plant a border (anything adjacent to one copy is adjacent
    // to all, so it reaches core degree itself) — asymmetric adjacency
    // is the point of this construction. Wide LSH params (16 tables ×
    // 2 bits) push candidate recall to ~1 at these moderate cosines so
    // the test pins DBSCAN semantics, not LSH luck.
    def at(deg: Double): Seq[Double] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r)) ++ Seq.fill(62)(0.0)
    }
    val rows = Seq((0L, at(0)), (1L, at(9)), (2L, at(-9)),
      (7L, at(28.5)), (9L, Seq(0.0, 0.0, 1.0) ++ Seq.fill(61)(0.0)))
    val got = Similarity.dbscanClustersOn(rows.toDF("id", "v"),
        eps = 0.94, minPts = 2, nTables = 16, nBits = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    Seq(0L, 1L, 2L).foreach(i => assert(got(i) == ((0L, "core")), s"$i -> ${got(i)}"))
    assert(got(7L) == ((0L, "border")), s"fan point: ${got(7L)}")
    assert(got(9L) == ((-1L, "noise")), s"orthogonal: ${got(9L)}")
  }

  test("PCA power: rank-1 planted cloud recovers axis, eigenvalue, full variance") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pca").toString
    // x = t·(1, 2, 0, 0) for t ∈ ±{1,2,3}: covariance is rank one, so
    // the iteration converges EXACTLY; λ = var(t)·|a|² = (28/6)·5 and
    // the unit loading is (1, 2, 0, 0)/√5, positive because a·𝟙 > 0
    val ts = Seq(-3f, -2f, -1f, 1f, 2f, 3f)
    ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(t, 2 * t, 0f, 0f), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.pcaPower(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 4)
    val loading = rows.sortBy(_._1).map(_._2)
    assert(math.abs(loading(0) - 1.0 / math.sqrt(5)) < 1e-6, s"l0=${loading(0)}")
    assert(math.abs(loading(1) - 2.0 / math.sqrt(5)) < 1e-6, s"l1=${loading(1)}")
    assert(math.abs(loading(2)) < 1e-8 && math.abs(loading(3)) < 1e-8,
      s"null dims: ${loading.toSeq}")
    assert(math.abs(rows.head._3 - 28.0 / 6 * 5) < 1e-3, s"lambda=${rows.head._3}")
    assert(rows.head._4 > 0.9999 && rows.head._4 <= 1.0001,
      s"var_explained=${rows.head._4}")
  }

  test("IVF append: appended vectors are searchable through the pruned scan") {
    val dir = "/root/testdata/sf0.001"
    val out = Similarity.seededIvfAppendQuery(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // late-batch content (vec_id >= 400) must be reachable: the whole
    // point of the append is that intake lands in the index
    assert(rows.exists(_.getLong(1) >= 400L),
      "no appended vector surfaced in any top-k — the append is invisible")
    // and the index scan prunes to the probe cells (the production
    // I/O shape: reads follow cells, not the corpus)
    val plan = out.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(plan).isDefined,
      s"no cell PartitionFilters on the append-index scan:\n$plan")
    // frozen geometry: every emitted neighbor's cell comes from the
    // base slice — seeds are base-only by construction
    spark.catalog.clearCache()
  }

  test("hamming pre-verify: no pair lost on the gate corpora, either threshold") {
    import org.apache.spark.sql.functions.{col, posexplode, round => rnd}
    // Reference = the SAME candidate generation with NO pre-filter
    // (the pre-round-9 operator): any divergence is a pair the bitmap
    // cutoff dropped. 2.5σ predicts ≤ ~0.6% loss AT the threshold
    // boundary; on the real corpora the loss must be exactly zero for
    // the row to have stayed hash-green — pin that directly.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         thr <- Seq(0.25, 0.4)) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(col("vec_id").as("id"), col("v"))
      // preVerifyFrom = 0 forces the ACTIVE pre-filter branch (the
      // default gates it off below the 2^14 knee, where these corpora
      // live — the default path equals the reference trivially)
      val got = Similarity.neardupPairsOn(e, thr, preVerifyFrom = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = e.count()
      val bits = Similarity.autoBits(n)
      val tables = Similarity.autoTables(bits)
      val sigs = Similarity.lshBuckets(e, "id", tables, bits, 64)
        .select(col("id"), col("tbl"), col("bucket"))
      val cand = sigs.as("a").join(sigs.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val va = e.select(col("id").as("id_a"), col("v").as("va"))
      val vb = e.select(col("id").as("id_b"), col("v").as("vb"))
      val ref = cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
        .withColumn("sim", graft.functions.vectorFunctions.cosine_sim(col("va"), col("vb")))
        .filter(col("sim") >= thr)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref,
        s"$dir thr=$thr: pre-verify changed the pair set — " +
          s"dropped ${(ref -- got).take(5)}, added ${(got -- ref).take(5)}")
      spark.catalog.clearCache()
    }
  }

  test("noiseFloorTau: gate anchors, monotone in n, sub-quadratic noise mass by construction") {
    // the exact grid values the registered row's oracle re-derives
    assert(Similarity.noiseFloorTau(64, 500) == 0.45)
    assert(Similarity.noiseFloorTau(64, 2000) == 0.5)
    // monotone in n, capped at the 0.95 near-dup regime
    val taus = Seq(1000L, 10000L, 100000L, 1000000L, 1000000000L)
      .map(Similarity.noiseFloorTau(64, _))
    assert(taus == taus.sorted, s"floor not monotone: $taus")
    assert(Similarity.noiseFloorTau(4, Long.MaxValue / 2) == 0.95)
    // THE scale-honesty property (round-9 verdict item 4): with
    // cos(noise) ~ N(0, 1/d), expected noise pairs
    // n²/2 · P(cos ≥ τ) ≤ n²/2 · e^(−(τ√d)²/2) ≤ n wherever the floor
    // is not capped — the registered row's output cannot go quadratic
    // on unrelated vectors (quantizing τ UP only tightens the bound).
    // The 0.95 cap marks where cosine stops separating near-dups from
    // noise AT ALL in that dimensionality (needs d ≳ 2.2·ln(n/2)):
    // low-d/huge-n combinations cap, and no threshold < 1 could help.
    for (d <- Seq(64, 256, 1024); n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val tau = Similarity.noiseFloorTau(d, n)
      assert(tau < 0.95, s"d=$d n=$n unexpectedly capped")
      val expectedNoise = n.toDouble * n / 2.0 * math.exp(-tau * tau * d / 2.0)
      assert(expectedNoise <= n.toDouble * 1.0001,
        s"d=$d n=$n tau=$tau: expected noise mass $expectedNoise exceeds n")
    }
  }

  test("hamCutFor: monotone in threshold, vacuous only at tiny signature widths") {
    // lower threshold → larger angle → larger expected hamming → larger cut
    assert(Similarity.hamCutFor(0.25, 12, 12) > Similarity.hamCutFor(0.4, 12, 12))
    // at the post-knee width (144 bits) the cut must BITE: strictly
    // below the noise mean B/2 for τ=0.4 — that gap is the pre-verify's
    // entire value (noise candidates centered at B/2 get cut)
    assert(Similarity.hamCutFor(0.4, 12, 12) < 72,
      s"cut ${Similarity.hamCutFor(0.4, 12, 12)} does not separate noise at B=144")
  }

  test("streaming IVF append equals the batch append; late content searchable") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val batch = rows(Similarity.seededIvfAppendQuery(spark, dir))
    val streamed = rows(Similarity.seededIvfAppendStreaming(spark, dir))
    // index CONTENT must be identical whether the late slice arrived
    // as one batch write or two micro-batch deltas — the property the
    // shared driver oracle also checks
    assert(streamed == batch, "micro-batch intake diverged from the batch append")
    assert(streamed.exists(_._2 >= 400L),
      "no micro-batch-appended vector surfaced in any top-k")
    spark.catalog.clearCache()
  }

  test("streaming IVF delta: replaying a batch body rewrites exactly its own bytes") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v"))
    val seeds = Similarity.frozenSeeds(spark,
      e.filter(col("vec_id") >= 5 && col("vec_id") < 400), kSeeds = 8)
    val drop = e.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val delta = new java.io.File(
      "target/scratch/spec_ivf_replay_" + System.nanoTime()).getAbsolutePath
    def writeBatch(): Unit =
      Similarity.assignToCells(drop, seeds)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$delta/batch=0")
    def state() = spark.read.parquet(delta)
      .select(col("neighbor_id"), col("cell"))
      .orderBy(col("neighbor_id")).collect().toSeq
    writeBatch()
    val after1 = state()
    writeBatch() // at-least-once REPLAY of batch 0
    assert(state() == after1, "replaying batch 0 changed the durable delta")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(delta))
  }
}
