package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Manifest
import graft.sources.Jdbc

/** JDBC manifest source: write → partitioned read round-trip against
  * embedded Derby (the reference's MySQL manifest, olrcdb.py:9-52, with a
  * URL-swap away). */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("manifest round-trips through Derby exactly; read is partitioned") {
    val m = Manifest.fromDocuments(spark, TestSpark.sf0001)
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby-spec")
      .resolve("db").toString
    val url = Jdbc.derbyUrl(dbDir)
    Jdbc.writeManifest(m, url)
    val maxId = m.agg(max("id")).head().getLong(0)
    val back = Jdbc.readManifest(spark, url, maxId, numPartitions = 4)
    // the partitioned read really fans out into 4 range queries
    assert(back.rdd.getNumPartitions == 4)
    val want = m.collect().map(_.toString).sorted.toSeq
    val got = back.select("id", "path", "uploaded")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    // pushdown: a filter on the partition column reaches the database
    assert(back.filter(col("id") <= 10).count() == 10)
  }
}
