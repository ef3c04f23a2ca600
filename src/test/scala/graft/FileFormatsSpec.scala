package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Manifest
import graft.sources.FileFormats

class FileFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("csv and json round-trips reproduce the manifest exactly (values and types)") {
    val want = Manifest.fromDocuments(spark, TestSpark.sf0001)
      .orderBy("id").collect().map(_.toString).toSeq
    for (key <- Seq("source_csv", "source_json")) {
      val got = FileFormats.queries(key)(spark, TestSpark.sf0001)
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        FileFormats.manifestSchema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"$key schema: ${got.schema}")
      assert(got.collect().map(_.toString).toSeq == want, key)
    }
  }
}
