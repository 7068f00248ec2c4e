package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of a 2-D point — the space-filling curve with
  * strictly better locality than the Z-order interleave (every pair of
  * curve-adjacent cells is grid-adjacent; Z-order jumps across the
  * plane at every power-of-two boundary seam). Used by
  * [[graft.ops.Layout]] to lay out a fact table so per-file min/max
  * statistics prune scans on BOTH dimensions.
  *
  * The xy→d walk is the classic bit-level formulation (Hamilton's
  * compact algorithm as popularized in the public literature): from
  * the top bit down, emit the quadrant digit, then rotate/reflect the
  * frame so the next bit's quadrant is measured in curve-local
  * coordinates. `bits` per dimension, output in [0, 4^bits). Pure
  * integer arithmetic, reproduced step-for-step by the generated
  * per-level CTE chain in the DuckDB oracle
  * ([[graft.ops.Layout.hilbertSqlCtes]]).
  *
  * Inputs MUST already be normalized to [0, 2^bits) — the caller owns
  * the scaling (same contract as the Z-interleave, where the binning
  * arithmetic is part of the query).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(xa: Any, ya: Any): Any = {
    var x = xa.asInstanceOf[Long]
    var y = ya.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $xa;
         |long $y = $ya;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      $x = $s - 1 - $x;
         |      $y = $s - 1 - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object spatialFunctions {
  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
