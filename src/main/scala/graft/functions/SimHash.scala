package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in ONE compiled pass — the map-only form
  * of the explode + 64-column bit-vote aggregate (see
  * graft.ops.Dedup.simhash scaladoc for the algorithm grounding).
  *
  * Semantics are bit-identical to the composed pipeline it replaces
  * (asserted in DedupSpec): words = split on single spaces, empty tokens
  * skipped, per-word hash = Spark's `xxhash64` (XXH64 over the word's
  * UTF-8 bytes, seed 42), per-bit vote +1/-1, fingerprint bit j set iff
  * vote > 0.
  *
  * Why native: the composed form generates one row per word (explode) and
  * shuffles docs×partitions partial rows of 64 vote columns; this is a
  * single `Static.compute(text)` call inside WholeStageCodegen — no
  * generator, no aggregate, no exchange. At 100 TB, fingerprinting
  * becomes a pure map over the corpus.
  */
object SimHash {
  private val Seed = 42L // Spark's xxhash64 default seed

  def compute(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    // split on the literal single space — identical tokenization to
    // split(text, " ") with empty tokens dropped (length > 0 filter).
    val words = s.split(UTF8String.fromString(" "), -1)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.numBytes > 0) {
        val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset,
          w.numBytes, Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** `bits`-bit SimHash over the DuckDB-replicable Karp-Rabin hash — the
    * map-only kernel behind Dedup.simhashReplicable (same one-pass
    * structure as [[compute]]; only the word-hash family differs, so the
    * fingerprints remain recomputable by the DuckDB oracle). */
  def computeRolling(s: UTF8String, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val words = s.split(UTF8String.fromString(" "), -1)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.numBytes > 0) {
        val h = RollingHash.compute(w)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(c)))

  def simhash_rolling(c: Column, bits: Int = 30): Column =
    GraftBridge.column(SimHashRollingExpr(GraftBridge.expression(c), bits))

  /** SQL-text registration: `SELECT simhash64(text)`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerTempFunction(spark, "simhash64",
      exprs => SimHash64Expr(exprs.head))
}

case class SimHashRollingExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_rolling requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_rolling"
  override def nullSafeEval(input: Any): Any =
    SimHash.computeRolling(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.computeRolling($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashRollingExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
