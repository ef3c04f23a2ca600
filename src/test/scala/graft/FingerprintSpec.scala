package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import org.apache.spark.unsafe.types.UTF8String

class FingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ref(s: String): Long = {
    var h = 0L
    s.codePoints().toArray.foreach(cp => h = (h * 131 + cp) % 1000000007L)
    h
  }

  test("rolling_hash matches the reference fold, incl. CJK codepoints") {
    for (s <- Seq("abc", "", "中文 text mixed", "a" * 100)) {
      assert(RollingHash.compute(UTF8String.fromString(s)) == ref(s), s)
      val viaExpr = Seq(s).toDF("t")
        .select(RollingHash.rolling_hash(col("t"))).as[Long].collect().head
      assert(viaExpr == ref(s), s"expr: $s")
    }
  }

  test("rolling window hashes equal brute-force per-window hashes") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val s = rnd.alphanumeric.take(3 + rnd.nextInt(30)).mkString
      val w = 1 + rnd.nextInt(9)
      val got = RollingHash.computeWindows(UTF8String.fromString(s), w).toLongArray()
      val want = (0 to s.length - w).map(i => ref(s.substring(i, i + w)))
      assert(got.toSeq == want, s"s=$s w=$w")
    }
  }

  test("windows shorter than w give an empty array") {
    assert(RollingHash.computeWindows(UTF8String.fromString("ab"), 5)
      .toLongArray().isEmpty)
  }

  test("expression survives codegen in a realistic plan (no fallback errors)") {
    val df = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), RollingHash.rolling_hash(col("text")).as("fp"),
        RollingHash.rolling_hash_windows(col("text"), 8).as("wins"))
      .filter(col("fp") >= 0)
    assert(df.count() > 0)
    assert(df.select(min(size(col("wins")))).as[Int].collect().head > 0)
  }
}
