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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and rebuild a
    * microsecond timestamp with integer division — all driver-generated
    * values are exactly us-aligned, and DuckDB's TIMESTAMP is us too, so
    * both engines see identical instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    // The legacy flag is set unconditionally in every session builder we
    // own (TestSpark/Sessions/Bench/Verify), so raw reads of
    // events.parquet see the same (long) schema regardless of call order;
    // this set is a defensive no-op there and only matters for foreign
    // sessions.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
