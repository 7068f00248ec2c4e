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

/** All-tables LSH bucket signatures in one pass: output[t] = the
  * sign-bit bucket of hyperplane table t, bit i set iff
  * dot(v, planes(t)(i)) ≥ 0 — exactly the semantics of the per-plane
  * `when(dot(v, array(lit...)) >= 0, 1L << i)` column stack it
  * replaces. That stack put nTables × nBits × dims literal nodes in
  * the plan (4096 at the 8×8×64 default) and dominated the ANN
  * queries' wall clock with analysis + codegen time; here the plane
  * matrix rides along as one flattened reference object and the dots
  * are a tight loop. Dot folds match [[DotProduct]]'s sequential
  * order (and NaN dots set no bit, like `NaN >= 0` = false). */
case class LshBucketSigs(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.head.nonEmpty && planes.head.head.nonEmpty,
    "need a nTables x nBits x dims plane matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "lsh_bucket_sigs"

  private lazy val nTables = planes.length
  private lazy val nBits = planes.head.length
  private lazy val dims = planes.head.head.length
  // flattened [t][i][d] -> t*nBits*dims + i*dims + d for cache-friendly access
  private lazy val flat: Array[Double] = {
    require(planes.forall(t => t.length == nBits && t.forall(_.length == dims)),
      "ragged plane matrix")
    planes.flatten.flatten.toArray
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var i = 0
      while (i < nBits) {
        var dot = 0.0
        val base = (t * nBits + i) * dims
        var d = 0
        while (d < n) { dot += v.getDouble(d) * flat(base + d); d += 1 }
        if (dot >= 0) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("lshExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $expr.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
  def lsh_bucket_sigs(v: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(LshBucketSigs(expr(v), planes))

  /** Register for SQL use: cosine_sim(a, b), l2_norm(a), dot_product(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "scala_udf")
  }
}
