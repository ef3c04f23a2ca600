package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrences of a text's whitespace words inside a fixed word set, as a
  * native Catalyst expression.
  *
  * The composable form — `size(filter(split(text, " "), w =>
  * w.isInCollection(set)))` — is semantically identical but higher-order
  * functions evaluate interpreted (a closure dispatch per word); the
  * language-ID expression evaluates FIVE of them per document and the
  * quality gate a sixth. This expression does the whole pass in one
  * compiled static call (split → hash-set membership count), keeping the
  * surrounding plan in whole-stage codegen. The set ships with the plan
  * via `addReferenceObj`, so executors see it without any static-registry
  * initialization order games.
  */
object WordSetCount {
  /** Split semantics match `split(text, " ")`: empty tokens kept (and
    * never members, since sets contain real words); every OCCURRENCE
    * counts, exactly like size(filter(...)). */
  def compute(s: UTF8String, set: java.util.HashSet[String]): Int = {
    val words = s.toString.split(" ", -1)
    var n = 0
    var i = 0
    while (i < words.length) {
      if (set.contains(words(i))) n += 1
      i += 1
    }
    n
  }

  def word_set_count(c: Column, words: Seq[String]): Column =
    GraftBridge.column(WordSetCountExpr(GraftBridge.expression(c), words))
}

case class WordSetCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(8, words.size * 2))
    words.foreach(s.add)
    s
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_set_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_set_count"
  override def nullSafeEval(input: Any): Any =
    WordSetCount.compute(input.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c => s"graft.functions.WordSetCount.compute($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordSetCountExpr =
    copy(child = newChild)
}
