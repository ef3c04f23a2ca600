package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Karp-Rabin) rolling hash — document fingerprinting for the
  * LLM-pipeline layer (SURVEY §2.13; generalizes the reference's per-file
  * identity, which is just the path string).
  *
  * Native Catalyst expressions (not UDFs): codegen emits a direct static
  * call, so the hot path stays inside WholeStageCodegen with no
  * serialization or closure dispatch. Base/modulus are chosen so the fold
  * fits in a 64-bit long (acc < 1e9, acc*131 + cp < 2^63) — which also
  * makes the same fold expressible in DuckDB BIGINT for the oracle.
  */
object RollingHash {
  val B = 131L
  val M = 1000000007L

  /** Full-string fingerprint: fold (acc*B + codePoint) % M. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * B + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  /** All hashes of `w`-code-point windows, computed in O(n) with the
    * rolling update h' = ((h - c_out*B^(w-1))*B + c_in) mod M.
    * Empty array when the text is shorter than `w`. */
  def computeWindows(s: UTF8String, w: Int): GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.empty[Long])
    // B^(w-1) mod M
    var bw = 1L
    var i = 0
    while (i < w - 1) { bw = (bw * B) % M; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      h = (h - (cps(i - w) * bw) % M + M) % M
      h = (h * B + cps(i)) % M
      out(i - w + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def rolling_hash(c: Column): Column =
    GraftBridge.column(RollingHashExpr(GraftBridge.expression(c)))

  def rolling_hash_windows(c: Column, w: Int): Column =
    GraftBridge.column(RollingHashWindowsExpr(GraftBridge.expression(c), w))

  /** Make the fingerprint functions callable from SQL text:
    * `SELECT rolling_hash(text)`, `rolling_hash_windows(text, 8)`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftBridge.registerTempFunction(spark, "rolling_hash",
      exprs => RollingHashExpr(exprs.head))
    GraftBridge.registerTempFunction(spark, "rolling_hash_windows", {
      case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(w, IntegerType)) =>
        RollingHashWindowsExpr(c, w.asInstanceOf[Int])
      case other =>
        throw new IllegalArgumentException(
          s"rolling_hash_windows(text, <int literal>) expected, got $other")
    })
  }
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

case class RollingHashWindowsExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window size must be >= 1, got $w")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_windows requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash_windows"
  override def nullSafeEval(input: Any): Any =
    RollingHash.computeWindows(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.computeWindows($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashWindowsExpr =
    copy(child = newChild)
}
