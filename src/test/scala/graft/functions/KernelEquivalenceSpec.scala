package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-for-bit equivalence of the round-4 native kernels against the
  * declarative HOF formulations they replaced (the same guarantee
  * DedupSpec pins for SimHash64): performance rewrites must never be
  * semantic rewrites. */
class KernelEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("WordNGrams equals the array_distinct(transform(concat_ws)) stack") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "", "ccc", "d e", "ü")
    // random token arrays incl. duplicates, empty tokens, len < n
    val rows = Seq.fill(300)(Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    val df = rows.toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      // production callers filter size(t) >= n BEFORE shingling (the
      // HOF reference is undefined below that: sequence(0, size-n)
      // descends); compare on that domain, and separately pin the
      // kernel's total behavior (empty array) below it
      val defined = df.filter(size(col("t")) >= n).select(
        graft.functions.textFunctions.word_ngrams(col("t"), n).as("native"),
        expr(
          s"""array_distinct(transform(sequence(0, size(t) - $n),
             |  i -> concat_ws(' ', slice(t, i + 1, $n))))""".stripMargin).as("hof"))
      assert(defined.filter(col("native") =!= col("hof")).count() == 0,
        s"n=$n mismatch")
      val below = df.filter(size(col("t")) < n)
        .select(graft.functions.textFunctions.word_ngrams(col("t"), n).as("native"))
      assert(below.filter(size(col("native")) =!= 0).count() == 0,
        s"n=$n: kernel not empty below the domain")
    }
  }

  test("MinHashSig equals the 64-pass array_min(transform) stack on the same hash") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val rows = Seq.fill(100)(Seq.fill(1 + rnd.nextInt(20))(
      rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString))
    val df = rows.toDF("shingles")
    val p = 2147483647L
    // any coefficient family exercises the kernel; production constants
    // are private[ops] and the equivalence is family-independent
    val crnd = new scala.util.Random(42)
    val coeffs: Seq[(Long, Long)] = Seq.fill(64)(
      (1L + crnd.nextInt(Int.MaxValue - 1).toLong, crnd.nextInt(Int.MaxValue).toLong))
    val hofExprs = coeffs.map { case (a, b) =>
      s"array_min(transform(hx, x -> ($a * x + $b) % $p))"
    }.mkString("array(", ", ", ")")
    // hx = the SAME m61+fmix hash family the kernel uses, reduced
    // into [0, P) with pmod (== Math.floorMod on signed longs)
    val staged = df.select(col("shingles"),
        graft.functions.textFunctions.minhash_sig(col("shingles"), coeffs, p).as("native"),
        graft.functions.textFunctions.m61_token_hashes(col("shingles")).as("th"))
      .selectExpr("native", s"transform(th, h -> pmod(h, $p)) AS hx")
      .selectExpr("native", s"$hofExprs AS hof")
    assert(staged.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("LshBucketSigs equals the per-plane literal column stack") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val dims = 16
    val rows = Seq.fill(200)(Seq.fill(dims)(rnd.nextGaussian()))
    val df = rows.toDF("v")
    val planes: Seq[Seq[Seq[Double]]] = Seq.fill(4, 6, dims)(rnd.nextGaussian())
    val perPlane = planes.map { table =>
      table.zipWithIndex.map { case (pl, i) =>
        val plane = array(pl.map(lit): _*)
        when(graft.functions.vectorFunctions.dot_product(col("v"), plane) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val both = df.select(
      graft.functions.vectorFunctions.lsh_bucket_sigs(col("v"), planes).as("native"),
      array(perPlane: _*).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }
}
