package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector arithmetic for the similarity layer.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically the dot
  * product but Spark's higher-order functions evaluate interpreted — a
  * closure dispatch per element. This expression is one compiled loop
  * over the two ArrayData buffers (primitive `getDouble`, no boxing) and
  * participates in whole-stage codegen via a static call.
  *
  * Summation is in index order, exactly like the higher-order form and
  * DuckDB's `list_inner_product` — bit-identical doubles, so swapping
  * this in cannot perturb the oracle.
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Symmetric int8 scalar quantization codes in one compiled two-pass
    * loop (amax, then floor(x·127/amax + 0.5)) — the composed
    * `transform(...)/array_max` form is three interpreted per-element
    * passes. Codes come back as array<double> so [[dot]] applies
    * directly (values are exact small integers). All-zero input yields
    * all-zero codes (the composed form's 127/0 → NaN chain is
    * noise, not semantics — SimilaritySpec pins both behaviors). */
  def quantizeInt8(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i)); if (v > amax) amax = v; i += 1
    }
    val out = new Array[Double](n)
    if (amax > 0) {
      val scale = 127.0 / amax
      i = 0
      while (i < n) {
        out(i) = math.floor(a.getDouble(i) * scale + 0.5); i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def quantize_int8(a: Column): Column =
    GraftBridge.column(QuantizeInt8Expr(GraftBridge.expression(a)))

  /** max_i |x_i − q_i/scale| in one compiled pass (q, scale as in
    * [[quantizeInt8]]) — the reconstruction-error half of the SQ8
    * report. Composed HOFs here are the O(d²) trap: a scalar `scale`
    * expression referenced inside a per-element lambda re-inlines its
    * whole array_max subtree PER ELEMENT (interpreted, allocating) —
    * measured 4.4 s for 2k×64 vectors vs milliseconds compiled. */
  def quantizeErrMax(a: ArrayData): Double = {
    val n = a.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i)); if (v > amax) amax = v; i += 1
    }
    if (amax == 0.0) return 0.0
    val scale = 127.0 / amax
    var worst = 0.0
    i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val e = math.abs(x - math.floor(x * scale + 0.5) / scale)
      if (e > worst) worst = e
      i += 1
    }
    worst
  }

  def quantize_err_max(a: Column): Column =
    GraftBridge.column(QuantizeErrMaxExpr(GraftBridge.expression(a)))
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "quantize_int8"
  override def nullSafeEval(a: Any): Any =
    VectorOps.quantizeInt8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.quantizeInt8($c)")
  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8Expr = copy(child = newChild)
}

case class QuantizeErrMaxExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_err_max requires array<double>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantize_err_max"
  override def nullSafeEval(a: Any): Any =
    VectorOps.quantizeErrMax(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.quantizeErrMax($c)")
  override protected def withNewChildInternal(
      newChild: Expression): QuantizeErrMaxExpr = copy(child = newChild)
}
