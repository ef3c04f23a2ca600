package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Manifest

/** JDBC manifest source (SURVEY §2.1 `source_jdbc`).
  *
  * Reference: the MySQL-backed manifest table read through a hand-rolled
  * connector (olrcdb.py:9-29, `SELECT ... WHERE uploaded='0'` through one
  * serial cursor). Spark-native replacement: `spark.read.jdbc` with a
  * partition column — N executors each issue a range-bounded query, so
  * the read scales horizontally instead of draining one cursor; filters
  * push down into the database as WHERE clauses.
  *
  * Backed here by embedded Derby (on the Spark classpath; the reference's
  * MySQL would be a URL change — the Spark code is identical). Column
  * types mirror olrcdb.py:36-52: `path VARCHAR(1000)`, `uploaded
  * BOOLEAN`.
  */
object Jdbc {

  /** One Derby database per (session, sf dir), loaded once with the
    * deterministic manifest — the registry query is then a pure
    * partitioned read. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  /** Write `df` as the JDBC `manifest` table (the prepare-side load). */
  def writeManifest(df: DataFrame, url: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", "manifest")
      .option("createTableColumnTypes",
        "id BIGINT, path VARCHAR(1000), uploaded BOOLEAN")
      .option("batchsize", "10000") // addBatch/executeBatch, not row INSERTs
      .mode("overwrite")
      .save()

  /** Partitioned read: `numPartitions` range-bounded queries on `id`. */
  def readManifest(spark: SparkSession, url: String, upperId: Long,
      numPartitions: Int = 4): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "manifest")
      .option("partitionColumn", "id")
      .option("lowerBound", "1")
      .option("upperBound", math.max(2L, upperId).toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  private def ensureLoaded(s: SparkSession, d: String): String =
    memo.computeIfAbsent((s, d), { case (spark, dir) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-derby")
      val dbDir = tmp.resolve("manifestdb").toString
      val url = derbyUrl(dbDir)
      writeManifest(Manifest.fromDocuments(spark, dir), url)
      graft.ops.SessionCleanup.onEnd(spark) {
        memo.remove((spark, dir))
        // clean Derby shutdown (throws SQLException on success by contract)
        try java.sql.DriverManager
          .getConnection(s"jdbc:derby:$dbDir;shutdown=true")
        catch { case _: java.sql.SQLException => () }
        graft.ops.SessionCleanup.deleteRecursively(tmp.toString)
      }
      url
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // manifest -> Derby -> partitioned JDBC read round-trip; must equal
    // the manifest exactly.
    "source_jdbc" -> ((s, d) => {
      val url = ensureLoaded(s, d)
      val n = Manifest.fromDocuments(s, d).agg(max("id")).head().getLong(0)
      readManifest(s, url, n)
        .select(col("id"), col("path"), col("uploaded"))
        .orderBy("id")
    })
  )

  def oracle: Map[String, String] = Map(
    "source_jdbc" -> graft.model.OracleSql.manifestSelect
  )
}
