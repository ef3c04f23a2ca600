package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Segments

class SegmentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("property: chunks concatenate to the original; sizes are `size` except last") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 25).map { _ =>
      val len = 1 + rnd.nextInt(40)
      val text = rnd.alphanumeric.take(len).mkString
      val size = 1 + rnd.nextInt(7)
      (text, size)
    }
    for ((text, size) <- cases) {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val segs = Segments.segmentText(df, col("doc_id"), col("text"), size)
        .orderBy("seg_no").collect()
      val joined = segs.map(_.getAs[String]("seg_text")).mkString
      assert(joined == text, s"text=$text size=$size")
      val lens = segs.map(_.getAs[Long]("seg_len"))
      assert(lens.init.forall(_ == size), s"text=$text size=$size")
      assert(lens.last <= size && lens.last >= 1, s"text=$text size=$size")
      assert(segs.length == (text.length + size - 1) / size)
    }
  }

  test("segment names are %04d zero-padded (filesegmenter.py:33-35)") {
    val df = Seq((7L, "abcdefghij")).toDF("doc_id", "text")
    val names = Segments.segmentText(df, col("doc_id"), col("text"), 3)
      .orderBy("seg_no").select("seg_name").as[String].collect()
    assert(names.toSeq == Seq("doc_7-0000.txt", "doc_7-0001.txt",
      "doc_7-0002.txt", "doc_7-0003.txt"))
  }
}
