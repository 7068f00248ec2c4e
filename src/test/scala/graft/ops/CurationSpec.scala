package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the curation/sketch operators (the driver's
  * DuckDB oracle pins exact values; these pin the semantic properties
  * that hold at any scale). */
class CurationSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("KMV: exact below k, within 2 sigma above k") {
    // sf0.001 has 15 users < k=32: the sketch IS the distinct set
    val r1 = Sketches.kmvUserCardinality(spark, dir).collect()(0)
    assert(r1.getAs[Long]("k_eff") == 15L)
    assert(r1.getAs[Double]("est_users") == 15.0)
    // sf0.01 has 150 users > k=32: estimator path, rsd ≈ 1/sqrt(k-2)
    val r2 = Sketches.kmvUserCardinality(spark, "/root/testdata/sf0.01").collect()(0)
    val est = r2.getAs[Double]("est_users")
    assert(math.abs(est - 150.0) / 150.0 < 2.0 / math.sqrt(30.0),
      s"KMV estimate $est too far from 150")
  }

  test("doc chunks tile each doc: stride offsets, full token coverage") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") >= 1)
    val chunks = Curation.docChunks(spark, dir)
    // every chunk's text really has n_chunk_tokens tokens
    assert(chunks.filter(
      size(split(col("chunk_text"), " ")).cast("long") =!= col("n_chunk_tokens"))
      .count() == 0)
    // per doc: chunk_ids are 0..nc-1 at stride offsets and the last
    // chunk ends exactly at the doc's token count
    val agg = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("nc"),
      max(col("chunk_id")).as("max_id"),
      max(col("start_tok") + col("n_chunk_tokens")).as("end_tok"))
    val joined = agg.join(docs, "doc_id")
    assert(joined.filter(col("max_id") =!= col("nc") - 1).count() == 0)
    assert(joined.filter(col("end_tok") =!= col("n")).count() == 0)
    assert(joined.count() == docs.count())
  }

  test("vocab OOV rates are sane and the vocab actually covers tokens") {
    val r = Curation.vocabOovRate(spark, dir)
    assert(r.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
    assert(r.filter(col("n_in_vocab") > col("n_tokens")).count() == 0)
    // 25 top tokens of a 31-word vocabulary must cover most occurrences
    val meanOov = r.agg(avg("oov_rate")).collect()(0).getDouble(0)
    assert(meanOov < 0.5, s"top-25 vocab covers too little: mean OOV $meanOov")
  }

  test("mixture balance: min stratum kept whole, others downsampled toward it") {
    val r = Curation.mixtureBalance(spark, dir).collect()
    val before = r.map(x => x.getAs[String]("lang") -> x.getAs[Long]("n_before")).toMap
    val after = r.map(x => x.getAs[String]("lang") -> x.getAs[Long]("n_after")).toMap
    val mn = before.values.min
    assert(after.forall { case (l, a) => a <= before(l) })
    // the argmin stratum has rate 1 (thr = 256 → keep-all branch)
    val argmin = before.minBy(_._2)._1
    assert(after(argmin) == before(argmin))
    // hash sampling is binomial around the target: allow 4 sigma
    after.foreach { case (l, a) =>
      val target = before(l).toDouble * math.min(1.0, (mn * 256 / before(l)).toDouble / 256.0)
      val sigma = math.sqrt(target) max 1.0
      assert(math.abs(a - target) <= 4 * sigma,
        s"$l: kept $a, target $target (before ${before(l)}, min $mn)")
    }
  }

  test("cluster assign: total, self-assignment of seeds, nearest wins") {
    val r = Similarity.clusterAssign(spark, dir)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(r.count() == n)
    // the seed vectors themselves must land on their own centroid at sim 1
    val seeds = r.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(seeds.size <= 8)
    val selfRows = r.filter(col("vec_id").isin(seeds.toSeq: _*)).collect()
    selfRows.foreach { row =>
      assert(row.getAs[Long]("centroid_id") == row.getAs[Long]("vec_id"),
        s"seed ${row.getAs[Long]("vec_id")} not self-assigned")
      assert(math.abs(row.getAs[Double]("sim") - 1.0) < 1e-6)
    }
  }

  test("novelty: first sighting is novel, copies are not, order matters") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (1 to 30).map(i => s"b$i").mkString(" ")
    // doc 0 first, doc 1 its exact copy, doc 2 fresh, doc 3 = half a / half b
    val docs = Seq((0L, a), (1L, a), (2L, b), (3L, a.split(" ").take(16).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curation.docNoveltyOn(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(0L) == 1.0, "the FIRST copy is fully novel — order is the semantics")
    assert(got(1L) == 0.0, "an exact copy of an earlier doc has zero novelty")
    assert(got(2L) == 1.0, "unrelated content is fully novel")
    assert(got(3L) == 0.0, "a pure excerpt of an earlier doc has zero novelty")
  }

  test("temperature mixture: tail language boosted, head damped, shares sum to 1") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curation").toString
    // 90/10 split: at alpha = 0.3 the tail should be upsampled ~3.4x
    ((1 to 90).map(i => (i.toLong, "en", "x")) ++
      (91 to 100).map(i => (i.toLong, "de", "x")))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Curation.temperatureMixture(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (nDe, pDe, qDe, bDe) = got("de")
    val (nEn, pEn, qEn, bEn) = got("en")
    assert(nDe == 10L && nEn == 90L && pDe == 0.1 && pEn == 0.9)
    assert(bDe > 1.0 && bEn < 1.0, s"boosts: de=$bDe en=$bEn")
    assert(math.abs(qDe + qEn - 1.0) <= 0.0002, s"shares: $qDe + $qEn")
    // scalar reference with the same 9dp decimal staging
    def round9(x: Double): BigDecimal =
      BigDecimal.decimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def round4(x: Double): Double =
      BigDecimal.decimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (q1, q2) = (round9(math.pow(0.1, 0.3)), round9(math.pow(0.9, 0.3)))
    val z = q1 + q2
    assert(qDe == round4(q1.toDouble / z.toDouble), s"p_temp de: $qDe")
    assert(bEn == round4((q2.toDouble / z.toDouble) / 0.9), s"boost en: $bEn")
  }
}
