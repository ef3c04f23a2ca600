package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core record types of the engine.
  *
  * The manifest row mirrors the reference's single real table
  * (olrcdb.py:36-52: `id INTEGER AUTO_INCREMENT, path VARCHAR(1000),
  * uploaded BOOL DEFAULT '0'`), re-expressed as an immutable parquet-backed
  * Dataset row. `id` is assigned deterministically (row_number over path
  * order), never `monotonically_increasing_id`, so results are stable and
  * oracle-checkable.
  */
final case class FileEntry(id: Long, path: String, uploaded: Boolean)

/** Result of one attempted upload (bulkupload.py:35-77 returns bool; we
  * keep the error + attempt count instead of a side-channel log file). */
final case class UploadResult(id: Long, ok: Boolean, attempts: Int, error: String)

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  * All reads are plain DataSource-V2 parquet scans: Catalyst pushes
  * filters/column pruning into the scan, so callers just compose on top.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as long via the legacy conf
    * and rebuild microseconds) and, in newer testdata generations, as
    * plain timestamp[us] (which Spark reads as TIMESTAMP_NTZ). Branch on
    * the type actually read so both generations land on one canonical
    * TimestampType column. Every session we own pins
    * spark.sql.session.timeZone=UTC, so the NTZ→Timestamp cast is
    * wall-clock identity and DuckDB (naive us TIMESTAMP) sees the same
    * instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // Defensive for foreign sessions; our own builders all set it.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Shared DuckDB oracle fragments — single source of truth for the
  * deterministic-manifest SQL that SparkEntry, Jdbc and FileFormats all
  * gate against (must mirror Manifest.fromDocuments exactly). */
object OracleSql {
  val manifestCte: String =
    """WITH manifest AS (
      |  SELECT CAST(row_number() OVER (ORDER BY source || '/doc_' || doc_id || '.txt') AS BIGINT) AS id,
      |         source || '/doc_' || doc_id || '.txt' AS path,
      |         (doc_id % 3 = 0) AS uploaded
      |  FROM documents
      |)""".stripMargin

  val manifestSelect: String =
    s"$manifestCte\nSELECT id, path, uploaded FROM manifest ORDER BY id"
}
