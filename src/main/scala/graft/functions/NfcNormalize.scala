package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (VERDICT r9 "Next round" #4) — the
  * canonical-composition pass a MULTILINGUAL corpus pipeline needs
  * before hashing/shingling: without it, `e` + COMBINING ACUTE and the
  * precomposed `é` are different byte sequences, so dedup shingles,
  * MinHash signatures, and vocabulary keys silently fragment on any
  * corpus that mixes sources (the temperature-mix keys explicitly
  * target one).
  *
  * Spark has no built-in NFC function; this is the native Catalyst
  * expression route (not a UDF): codegen emits a direct static call to
  * `java.text.Normalizer.normalize(s, NFC)` — the JDK's implementation
  * of the Unicode canonical-composition algorithm, the same spec
  * DuckDB's `nfc_normalize` implements, which is what lets the
  * registered key hash-gate byte-for-byte across engines (TextSpec
  * pins composition, casefold interaction, and idempotence).
  *
  * The `lower` flag fuses a LOCALE-PINNED (Locale.ROOT) lowercase in
  * front of the composition. Spark's own `lower()` falls back to the
  * JVM-default-locale `String.toLowerCase()` for non-ASCII input, so a
  * driver running under tr-TR/az/lt would turn capital I into dotless
  * ı while DuckDB's locale-independent lower yields i — the byte-exact
  * hash gates (and the "canonical form" promise itself) must not
  * depend on the machine's locale.
  */
object Nfc {

  def compute(s: UTF8String): UTF8String = compute(s, false)

  def compute(s: UTF8String, toLower: Boolean): UTF8String = {
    // ASCII fast path on the raw UTF-8 bytes, BEFORE any String decode
    // (bytes == code points ⟺ pure ASCII, and ASCII is closed under
    // NFC and under ROOT-locale lowercase — UTF8String.toLowerCase
    // takes its branchless byte path here) — the overwhelming hot path
    // of a text corpus allocates nothing. Non-ASCII rows decode once;
    // already-normalized ones return without a second copy.
    if (s.numBytes == s.numChars)
      return if (toLower) s.toLowerCase else s
    var str = s.toString
    if (toLower) str = str.toLowerCase(java.util.Locale.ROOT)
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) {
      if (toLower) UTF8String.fromString(str) else s
    } else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    GraftBridge.column(NfcExpr(GraftBridge.expression(c)))

  /** Locale-pinned lowercase fused with NFC — what [[graft.ops.Text
    * .normalizeUnicode]] uses instead of Spark's default-locale
    * `lower()`. */
  def nfcLower(c: Column): Column =
    GraftBridge.column(NfcExpr(GraftBridge.expression(c), lower = true))

  /** Make it callable from SQL text: `SELECT nfc_normalize(text)` —
    * the same name DuckDB uses, so SQL snippets port verbatim (pure
    * NFC, no casefold — matching DuckDB's function exactly). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerTempFunction(spark, "nfc_normalize",
      exprs => NfcExpr(exprs.head))
}

case class NfcExpr(child: Expression, lower: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    Nfc.compute(input.asInstanceOf[UTF8String], lower)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfc.compute($c, $lower)")
  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}
