package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native kernels' arithmetic against
  * straightforward reference models — the shift-fold tricks must equal
  * plain (BigInt) modular math for every input in their precondition
  * domain, and the codegen'd SimHash must equal a naive bit-vote
  * reimplementation. (Drives ScalaCheck `Gen` directly — the
  * scalatestplus bridge is not in the offline dependency cache.) */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(a => try f(a) catch {
          case e: Throwable =>
            fail(s"failed for seed=$i input=$a: ${e.getMessage}", e)
        })
    }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(p => f(p._1, p._2, p._3))

  private val M61 = TextExpressions.M61

  test("fold61 equals BigInt modular arithmetic over the full domain") {
    val accGen = Gen.chooseNum(0L, M61 - 1)
    val xGen = Gen.chooseNum(0L, M61 - 1)
    val shiftGen = Gen.oneOf(1, 5, 13, 31, 60, 61)
    forAll(accGen, xGen, shiftGen) { (acc: Long, x: Long, s: Int) =>
      val expected = ((BigInt(acc) * BigInt(2).pow(s) + x) mod BigInt(M61)).toLong
      assert(TextExpressions.fold61(acc, s, x) == expected,
        s"acc=$acc s=$s x=$x")
    }
  }

  test("fold61 edge values: zero, max, and wrap-to-zero cases") {
    assert(TextExpressions.fold61(0L, 5, 0L) == 0L)
    assert(TextExpressions.fold61(M61 - 1, 61, M61 - 1) ==
      ((BigInt(M61 - 1) * BigInt(2).pow(61) + (M61 - 1)) mod BigInt(M61)).toLong)
    // acc * 2^s + x ≡ 0 (mod M61): acc = 1, s = 61 (2^61 ≡ 1), x = M61 - 1
    assert(TextExpressions.fold61(1L, 61, M61 - 1) == 0L)
  }

  test("SimHash64 kernel equals a naive bit-vote model") {
    val hashes = Gen.listOfN(20, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    forAll(hashes) { (hs: List[Long]) =>
      val naive = {
        var out = 0L
        for (i <- 0 until 64) {
          val votes = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
          if (votes >= 0) out |= (1L << i)
        }
        out
      }
      val got = SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs.toArray),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null).asInstanceOf[Long]
      assert(got == naive)
    }
  }

  test("winnow kernel equals a direct Scala reimplementation") {
    val token = Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString)
    val docGen = Gen.chooseNum(8, 30).flatMap(n => Gen.listOfN(n, token))
    forAll(docGen) { (tokens: List[String]) =>
      val k = 5; val w = 4
      val th = tokens.map { t =>
        t.codePoints().toArray.foldLeft(0L)((a, c) =>
          ((BigInt(a) * 32 + c) mod BigInt(M61)).toLong)
      }
      val kh = th.sliding(k).map(_.foldLeft(0L)((a, h) =>
        ((BigInt(a) * 8192 + h) mod BigInt(M61)).toLong)).toSeq
      val expected = kh.sliding(w).map(_.min).toSeq.distinct
      val got = WinnowTokenFingerprints(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        k, w)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(got == expected)
    }
  }

  test("kgram span hashes equal the BigInt model and bound the winnow set") {
    val token = Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString)
    val docGen = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, token))
    forAll(docGen) { (tokens: List[String]) =>
      val k = 5
      val th = tokens.map { t =>
        t.codePoints().toArray.foldLeft(0L)((a, c) =>
          ((BigInt(a) * 32 + c) mod BigInt(M61)).toLong)
      }
      val expected =
        if (tokens.length < k) Seq.empty[Long]
        else th.sliding(k).map(_.foldLeft(0L)((a, h) =>
          ((BigInt(a) * 8192 + h) mod BigInt(M61)).toLong)).toSeq
      val got = KgramSpanHashes(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        k)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(got == expected)
      // winnow's fingerprints are window-minima OF these span hashes
      if (tokens.length >= k + 3) {
        val fps = WinnowTokenFingerprints(
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
              tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
          k, 4)
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSet
        assert(fps.subsetOf(got.toSet))
      }
    }
  }
}
