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

  test("schema-evolution read: merged schema is the union by name, each " +
      "generation's missing columns are NULL, every doc surfaces once") {
    val docs = graft.model.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    val got = FileFormats.queries("source_schema_evolution")(
      spark, TestSpark.sf0001).collect()
    assert(got.length == docs.length)
    got.zip(docs).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      val even = g.getLong(0) % 2 == 0
      // v1 (even ids) kept lang, never had source/n_chars; v2 inverse
      assert(g.isNullAt(2) == even && g.isNullAt(3) == even, g.toString)
      assert(g.isNullAt(1) == !even, g.toString)
      if (even) assert(g.getString(1) == w.getString(1))
      else {
        assert(g.getString(2) == w.getString(2))
        assert(g.getLong(3) == w.getLong(3))
      }
    }
  }
}
