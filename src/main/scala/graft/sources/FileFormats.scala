package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
import graft.ops.Manifest

/** CSV and JSON-lines manifest sources — the interchange formats a real
  * ingestion pipeline receives manifests in (the reference consumes only
  * its MySQL table; these extend the same source surface the §2.1
  * `source_jdbc` row established).
  *
  * Spark-native: DataSource csv/json scans with an EXPLICIT schema —
  * schema inference is a full extra pass over the data at 100 TB and is
  * type-unstable (a later file can widen a column); reads split by file
  * block, column pruning and filters push into the scan like any
  * file-based source.
  *
  * Each registry query is a write-once (memoized per session/dir) →
  * read-back round-trip that must reproduce the manifest EXACTLY —
  * hash-gated against the same DuckDB manifest CTE as `source_jdbc`. */
object FileFormats {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  val manifestSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("uploaded", BooleanType, nullable = false)))

  private def ensureWritten(s: SparkSession, d: String): String =
    memo.computeIfAbsent((s, d), { case (spark, dir) =>
      val root = java.nio.file.Files.createTempDirectory("graft-fmt").toString
      val m = Manifest.fromDocuments(spark, dir)
      m.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
      m.write.mode("overwrite").json(s"$root/json")
      graft.ops.SessionCleanup.onEnd(spark) {
        memo.remove((spark, dir))
        graft.ops.SessionCleanup.deleteRecursively(root)
      }
      root
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_csv" -> ((s, d) => {
      val root = ensureWritten(s, d)
      s.read.schema(manifestSchema).option("header", "true")
        .csv(s"$root/csv").orderBy("id")
    }),
    "source_json" -> ((s, d) => {
      val root = ensureWritten(s, d)
      s.read.schema(manifestSchema).json(s"$root/json").orderBy("id")
    })
  )

  def oracle: Map[String, String] = Map(
    "source_csv" -> graft.model.OracleSql.manifestSelect,
    "source_json" -> graft.model.OracleSql.manifestSelect
  )
}
