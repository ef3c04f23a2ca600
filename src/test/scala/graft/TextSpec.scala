package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Text
import graft.model.Tables

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native word_set_count scoring equals the composed size(filter(...)) " +
      "forms value-for-value (sf0.001 corpus + edge cases)") {
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text")
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "the"),
      (9004L, "the the the"), (9005L, "中文 的 mixed the 的"))
      .toDF("doc_id", "text")
    val docs = corpus.union(edge)
    val langs = Seq("en", "de", "es", "fr", "zh")
    val native = docs.select(col("doc_id") +:
        round(Text.stopwordRatio(col("text")), 9).as("sr") +:
        langs.map(l => Text.langScore(col("text"), l).as(s"s_$l")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val composed = docs.select(col("doc_id") +:
        round(Text.stopwordRatioComposed(col("text")), 9).as("sr") +:
        langs.map(l => Text.langScoreComposed(col("text"), l).as(s"s_$l")): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(native == composed)
    // sanity on the edge rows: occurrences (not distinct words) count
    assert(native(9004L)(1) == 3L) // "the the the" scores 3 for en
  }
}
