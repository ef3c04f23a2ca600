package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Manifest lifecycle operators — the reference's core data model.
  *
  * Reference: the MySQL manifest table (olrcdb.py:36-52) created by
  * `prepareupload.py` (recursive walk → one INSERT per file,
  * prepareupload.py:21-60) and consumed/mutated by `bulkupload.py`
  * (`SELECT ... WHERE uploaded='0' ORDER BY id DESC` bulkupload.py:354-360,
  * `UPDATE ... SET uploaded='1' WHERE id=?` bulkupload.py:253-261).
  *
  * Spark design: the manifest is an immutable parquet snapshot; "UPDATE" is
  * a join + rewrite ([[markUploaded]]). For the driver's oracle gate the
  * manifest is *derived deterministically* from the `documents` test table
  * (path = source/doc_<id>.txt, uploaded seeded by doc_id % 3 == 0) so every
  * operator is expressible as DuckDB SQL over the same parquet.
  *
  * Scale note (100 TB): id assignment is the distributed range-partition
  * form ([[graft.ops.Scale.assignIdsByRange]]: range-repartition +
  * per-partition prefix-sum) — ids depend only on the global path order,
  * so they are identical to `row_number().over(Window.orderBy(path))`
  * (asserted in ScaleSpec) without the single-partition sort that form
  * plans. The derived manifest is memoized per (session, dir): it is
  * metadata (paths + flags, orders of magnitude smaller than payloads),
  * so caching it once per run is the same move a real deployment makes by
  * keeping the manifest as its own small table.
  */
object Manifest {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Deterministic manifest derived from `documents`: the Spark equivalent
    * of `prepare_upload` + `create_table` (id assignment = AUTO_INCREMENT,
    * olrcdb.py:40, dense ids in path order — SURVEY §2.1
    * `manifest_create`). */
  def fromDocuments(spark: SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent((spark, dir), { case (s, d) =>
      val docs = Tables.documents(s, d)
      val paths = docs.select(
        concat(col("source"), lit("/doc_"), col("doc_id"), lit(".txt")).as("path"),
        (col("doc_id") % 3 === 0).as("uploaded"))
      // cacheResult: the id'd frame is cached+materialized inside
      // assignIdsByRange and the intermediate sorted RDD released there —
      // the manifest is stored once, not twice (unpersist of the cached
      // frame is registered there too).
      val withIds = Scale.assignIdsByRange(paths, "path", cacheResult = true)
        .select(col("id"), col("path"), col("uploaded"))
      SessionCleanup.onEnd(s) { memo.remove((s, d)) }
      withIds
    })

  /** Full scan (`get_all_entries_to_upload`'s SELECT *, bulkupload.py:354-360). */
  def scan(spark: SparkSession, dir: String): DataFrame =
    fromDocuments(spark, dir).orderBy("id")

  /** Resume predicate `WHERE uploaded='0'` (bulkupload.py:357). Catalyst
    * pushes this to the scan when the manifest is a parquet snapshot. */
  def filterPending(m: DataFrame): DataFrame =
    m.filter(!col("uploaded"))

  /** `WHERE uploaded='1'` — resume counter seed (bulkupload.py:242-250). */
  def filterUploaded(m: DataFrame): DataFrame =
    m.filter(col("uploaded"))

  /** Column pruning to (id, path) — tuple indexing bulkupload.py:193/197. */
  def projectEntry(m: DataFrame): DataFrame =
    m.select("id", "path")

  /** The core mutation: `UPDATE t SET uploaded='1' WHERE id=?` per success
    * (set_uploaded, bulkupload.py:253-261) re-expressed as a set-oriented
    * left join + flag OR. `results` carries an `id` column of succeeded
    * uploads. Small result sets are broadcast (hinted) so the manifest
    * never shuffles. */
  def markUploaded(m: DataFrame, results: DataFrame): DataFrame = {
    val r = broadcast(results.select(col("id").as("_ok_id")).distinct())
    m.join(r, m("id") === r("_ok_id"), "left")
      .withColumn("uploaded", col("uploaded") || col("_ok_id").isNotNull)
      .drop("_ok_id")
  }

  /** Anti-join resume: rows of a fresh scan not yet in the indexed set
    * (readme.md:42 "re-run and continue uploading without reuploading").
    * The reference encodes this as the uploaded flag; the general form is
    * a left_anti join on path. */
  def antiResume(scanned: DataFrame, indexed: DataFrame): DataFrame =
    scanned.join(indexed, Seq("path"), "left_anti")

  /** Semi-join: scan rows already done. */
  def semiUploaded(scanned: DataFrame, indexed: DataFrame): DataFrame =
    scanned.join(indexed, Seq("path"), "left_semi")
}
