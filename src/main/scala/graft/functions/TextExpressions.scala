package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native kernels for the text near-dup pipeline. Both take an
  * `array<bigint>` of per-feature hashes (producer: `transform(...,
  * xxhash64)` in the scan stage) and run tight generated loops — the
  * higher-order-function formulations evaluate an interpreted lambda
  * per (element × pass) and measured 10-30× slower at sf0.1
  * (PLAN_NOTES.md).
  */

/** 64-bit SimHash of a feature-hash array: bit i of the result is set
  * iff the ±1 votes of bit i across all feature hashes sum ≥ 0.
  * Bit-for-bit the semantics of the HOF formulation it replaces
  * (pinned in DedupSpec). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireLongArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    while (j < xs.numElements()) {
      val h = xs.getLong(j)
      var i = 0
      while (i < 64) {
        votes(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) >= 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((int)(($h >>> $i) & 1L) << 1) - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] >= 0) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints (MOSS): k-gram hashes by polynomial rolling
  * combination of `k` consecutive feature hashes, then the distinct
  * minima (first-occurrence order) of every sliding window of `w`
  * k-gram hashes. Output `array<bigint>`. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireLongArray(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val nk = n - k + 1
    if (nk < w) return new GenericArrayData(Array.empty[Long])
    val kh = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = acc * TextExpressions.PolyA + xs.getLong(i + j); j += 1 }
      kh(i) = acc
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= nk - w) {
      var min = kh(i)
      var j = 1
      while (j < w) { if (kh(i + j) < min) min = kh(i + j); j += 1 }
      seen.add(min)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  // CodegenFallback-style: array-building loops with hash-set state
  // gain little from inline codegen; the interpreted path above is
  // already tight JVM loops (no per-element lambda dispatch).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("winnowExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Polynomial multiplier for k-gram rolling hashes (odd 64-bit). */
  val PolyA: Long = 0x9e3779b97f4a7c15L

  def requireLongArray(fn: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<bigint> input, got ${other.simpleString}")
  }
}

object textFunctions {
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
  def winnow_fingerprints(hashes: Column, k: Int = 5, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(hashes), k, w))
}
