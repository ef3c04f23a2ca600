package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions._

/** Library entry point for SQL-text users (the SparkSessionExtensions
  * route the Spark docs prescribe for extension libraries):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * registers every graft native Catalyst expression as a first-class SQL
  * function — `rolling_hash(text)`, `rolling_hash_windows(text, w)`,
  * `word_shingles(text, n)`, `simhash64(text)`, `minhash_sig(text, k)`,
  * `dot_product(a, b)`, `quantize_int8(a)`, `word_set_count(text, array(...))`,
  * `nfc_normalize(text)` — session-wide
  * and for every session built with
  * the extension, unlike the per-session temp registration in
  * `RollingHash.registerSql`. The builders hand Catalyst the same
  * codegen'd expressions the Column API uses, so SQL text and DataFrame
  * callers share one implementation (and its property-test coverage).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  // builders run at analysis time, BEFORE ConstantFolding — accept any
  // foldable int expression (8, 2+1, CAST(4 AS INT)), not just bare
  // literals.
  private def intLit(e: Expression, fn: String): Int =
    if (e.foldable && e.dataType == IntegerType) e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn expects a constant integer, got null/$other")
    } else throw new IllegalArgumentException(
      s"$fn expects a constant integer argument, got $e")

  private def stringSeqLit(e: Expression, fn: String): Seq[String] = e.dataType match {
    case ArrayType(_: StringType, _) if e.foldable => e.eval() match {
      case a: ArrayData =>
        a.toObjectArray(StringType).map {
          case null => throw new IllegalArgumentException(
            s"$fn expects non-null words in its constant array")
          case u: UTF8String => u.toString
        }.toSeq
      case _ => throw new IllegalArgumentException(
        s"$fn expects a constant array of strings, got null")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn expects a constant array<string> argument, got $e")
  }

  private def d(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    d("rolling_hash", classOf[RollingHashExpr],
      es => RollingHashExpr(es.head)),
    d("rolling_hash_windows", classOf[RollingHashWindowsExpr],
      es => RollingHashWindowsExpr(es.head, intLit(es(1), "rolling_hash_windows"))),
    d("word_shingles", classOf[WordShinglesExpr],
      es => WordShinglesExpr(es.head, intLit(es(1), "word_shingles"))),
    d("simhash64", classOf[SimHash64Expr],
      es => SimHash64Expr(es.head)),
    d("minhash_sig", classOf[MinHashSigExpr],
      es => MinHashSigExpr(es.head, intLit(es(1), "minhash_sig"))),
    d("dot_product", classOf[DotProductExpr],
      es => DotProductExpr(es.head, es(1))),
    d("quantize_int8", classOf[QuantizeInt8Expr],
      es => QuantizeInt8Expr(es.head)),
    d("word_set_count", classOf[WordSetCountExpr],
      es => WordSetCountExpr(es.head, stringSeqLit(es(1), "word_set_count"))),
    d("nfc_normalize", classOf[NfcExpr],
      es => NfcExpr(es.head))
  )
}
