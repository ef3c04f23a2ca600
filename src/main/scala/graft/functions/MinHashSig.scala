package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-wide MinHash signature of a document in ONE compiled pass — the
  * map-only form of explode(shingles) + k min-aggregates
  * (graft.ops.Dedup.minhashSignatures scaladoc has the algorithm
  * grounding).
  *
  * Signature values are bit-identical to the composed pipeline (asserted
  * in DedupSpec): 3-word shingles over `split(text, " ")` with empty
  * tokens kept, docs with fewer than 3 tokens yield NULL (the composed
  * form's `size >= 3` filter), and h_i(shingle) replicates Spark's
  * `xxhash64(lit(i), shingle)` seed chain: XXH64.hashInt(i, 42) then
  * XXH64.hashUnsafeBytes(shingle utf8, that).
  *
  * Two extra tricks the composed form cannot express: duplicates need no
  * dedup at all (min over a multiset equals min over its set — the
  * composed form pays a per-doc LinkedHashSet inside word_shingles), and
  * the k seed-hashes per shingle happen in-register with no row
  * materialization. No generator, no aggregate, no exchange: at 100 TB
  * signature computation is a pure map over the corpus.
  */
object MinHashSig {
  private val Seed = 42L // Spark's xxhash64 default seed

  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length < 3) return null
    val seeds = new Array[Long](k)
    var t = 0
    while (t < k) { seeds(t) = XXH64.hashInt(t, Seed); t += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - 3) {
      sb.setLength(0)
      sb.append(words(i)).append(' ')
        .append(words(i + 1)).append(' ')
        .append(words(i + 2))
      val u = UTF8String.fromString(sb.toString)
      t = 0
      while (t < k) {
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes, seeds(t))
        if (h < mins(t)) mins(t) = h
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  def minhash_sig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c), k))
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature width must be >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL for docs with < 3 tokens, independent of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // not defineCodeGen: compute() returns null for <3-token docs, so the
    // generated code must set isNull from the RESULT, not just the child.
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($c, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
