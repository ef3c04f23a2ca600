package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.model.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mapPartitions decode stub equals its expression twin row-for-row") {
    val bin = Multimodal.withBinaryContent(Tables.documents(spark, TestSpark.sf0001))
    val viaMp = Multimodal.decodeStub(bin).collect()
      .map(d => (d.doc_id, d.width, d.height, d.n_frames, d.n_bytes)).toSet
    val viaExpr = Multimodal.decodeStubExprs(bin)
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(viaMp == viaExpr)
    assert(viaMp.nonEmpty)
  }

  test("mapPartitions resize stub equals its expression twin row-for-row") {
    val bin = Multimodal.withBinaryContent(
      Tables.documents(spark, TestSpark.sf0001).filter(length(col("text")) > 0))
    val viaMp = Multimodal.resizeStub(bin).collect()
      .map(r => (r.doc_id, r.out_w, r.out_h, r.thumb_hex)).toSet
    val viaExpr = Multimodal.resizeStubExprs(bin)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(viaMp == viaExpr)
    assert(viaMp.nonEmpty)
    // resized dims actually fit the 64-px box
    assert(viaMp.forall { case (_, w, h, _) => w <= 64 && h <= 64 && w >= 1 && h >= 1 })
  }

  test("binary payload length is utf-8 bytes, not chars (CJK differs)") {
    // (the testdata's lang column is a label only — its text is ASCII —
    // so assert on constructed CJK content)
    val docs = Seq((1L, "中文内容", "zh", "src0", 4L), (2L, "abcd", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.withBinaryContent(docs)
      .select(col("doc_id"), col("meta.n_bytes")).as[(Long, Long)]
      .collect().toMap
    assert(got(1L) == 12L) // 4 CJK chars x 3 bytes
    assert(got(2L) == 4L)
  }
}
