package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions entry point: a session built with
  * `withExtensions(new GraftExtensions)` can call every graft native
  * expression from pure SQL text, producing the same values as the
  * Column API (same Expression classes underneath). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-injected SQL functions match the Column API") {
    val base = TestSpark.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(ext ne base) // a genuinely new session, extensions applied
      val row = ext.sql(
        """SELECT rolling_hash('abc')                 AS rh,
          |       rolling_hash_windows('abcde', 3)    AS rhw,
          |       word_shingles('a b c d', 3)         AS ws,
          |       simhash64('hello world hello')      AS sh,
          |       minhash_sig('a b c d e', 4)         AS mh,
          |       dot_product(array(1.0D, 2.0D, 3.0D),
          |                   array(4.0D, 5.0D, 6.0D)) AS dp
          |""".stripMargin).head()
      import org.apache.spark.sql.functions._
      val want = ext.range(1).select(
        graft.functions.RollingHash.rolling_hash(lit("abc")).as("rh"),
        graft.functions.RollingHash.rolling_hash_windows(lit("abcde"), 3).as("rhw"),
        graft.functions.Shingles.word_shingles(lit("a b c d"), 3).as("ws"),
        graft.functions.SimHash.simhash64(lit("hello world hello")).as("sh"),
        graft.functions.MinHashSig.minhash_sig(lit("a b c d e"), 4).as("mh"),
        graft.functions.VectorOps.dot_product(
          lit(Array(1.0, 2.0, 3.0)), lit(Array(4.0, 5.0, 6.0))).as("dp")
      ).head()
      assert(row.toString == want.toString)
      assert(row.getDouble(5) == 32.0)
      // int arguments need only be constant-foldable, not bare literals
      val folded = ext.sql(
        "SELECT word_shingles('a b c d', 2+1) AS ws, " +
          "minhash_sig('a b c d e', CAST(4 AS INT)) AS mh").head()
      assert(folded.getSeq[String](0) == row.getSeq[String](2))
      assert(folded.getSeq[Long](1) == row.getSeq[Long](4))
      // array<string> constant argument (word_set_count)
      val wsc = ext.sql(
        "SELECT word_set_count('the cat and the dog', array('the','and')) AS n")
        .head().getInt(0)
      assert(wsc == 3)
      // quantize_int8: amax maps to ±127, half-scale to ±64 (half-up)
      val q8 = ext.sql(
        "SELECT quantize_int8(array(1.0D, -1.0D, 0.5D, 0.0D)) AS q")
        .head().getSeq[Double](0)
      assert(q8 == Seq(127.0, -127.0, 64.0, 0.0))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
