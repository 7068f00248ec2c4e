package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math over
  * `array<double>` columns, with whole-stage codegen.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * see [[graft.ops.Similarity]]) evaluates an interpreted lambda per
  * element — measured ~6× slower than this tight generated loop on the
  * ANN queries. Accumulation order is the same sequential left-fold,
  * so results are bit-identical to both the HOF version and DuckDB's
  * list functions (which is what keeps the ANN oracle exact).
  *
  * This is extension tier (b) of the build rules: a custom
  * `Expression` with `doGenCode`, preferred over a Scala UDF (boxing,
  * no codegen) when built-in operators can't express the kernel
  * efficiently.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val xi = x.getDouble(i); s += xi * xi; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double x = $a.getDouble($i);
         |  $s += x * x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product with the same sequential fold order as the codegen'd
  * cosine (kept separate so callers can normalize once and reuse). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Shared input validation: every argument must be array<double>. */
  def requireDoubleArrays(fn: String, dts: DataType*): TypeCheckResult =
    if (dts.forall { case ArrayType(DoubleType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<double> arguments, got ${dts.map(_.simpleString).mkString(", ")}")
}

object vectorFunctions {
  private def expr(c: Column) = ColumnBridge.expression(c)
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(expr(a), expr(b)))
  def l2_norm(a: Column): Column = ColumnBridge.column(L2Norm(expr(a)))
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(expr(a), expr(b)))

  /** Register for SQL use: cosine_sim(a, b), l2_norm(a), dot_product(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "scala_udf")
  }
}
