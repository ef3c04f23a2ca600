package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Manifest
import graft.sink.{LocalFsStore, Uploader}

/** Flagship end-to-end pipeline — the full reference equivalence:
  * index → pending → upload → mark → report (SURVEY §3.2).
  *
  * Reference flow: `prepareupload.py` (index) then `bulkupload.py`
  * (auth → container → plan → fork N workers → per-file PUT+UPDATE →
  * report). Here it is one Spark job graph:
  *
  *   manifest (derived)         — prepare_upload + create_table
  *   └ filter(!uploaded)        — WHERE uploaded='0'   (bulkupload.py:357)
  *     └ mapPartitions(upload)  — N workers + retry    (bulkupload.py:164-228)
  *       └ join → markUploaded  — set_uploaded         (bulkupload.py:253-261)
  *         └ agg report         — end_reporting        (bulkupload.py:301-317)
  *
  * Returns the one-row report DataFrame (driver smoke-checks rows > 0).
  */
object Pipeline {

  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._

    // 1. Index (manifest_create) — with payload carried alongside.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val m = Manifest.fromDocuments(spark, dir)
    val withContent = m.join(
      docs.select(concat(lit("doc_"), col("doc_id"), lit(".txt")).as("_base"),
        col("text")),
      expr("path like concat('%/', _base)"))

    // 2. Plan: pending only, processed in id order (ORDER BY id DESC +
    //    tail-pop in the reference ⇒ ascending processing order).
    val pending = withContent.filter(!col("uploaded"))
      .select(col("id"), col("path"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, path, text) => (id, path, text.getBytes("UTF-8")) }

    // 3. Provision container + upload via per-partition clients.
    val storeRoot =
      java.nio.file.Files.createTempDirectory("graft-store").toString
    new LocalFsStore(storeRoot).ensureContainer()
    val counters = Uploader.mkCounters(spark)
    val results = Uploader.upload(pending, () => new LocalFsStore(storeRoot),
      parallelism = spark.sparkContext.defaultParallelism,
      counters = Some(counters)).cache()

    // 4. Mark uploaded (snapshot semantics; see ManifestStore for swap).
    val marked = Manifest.markUploaded(m, results.filter(col("ok")).toDF())

    // 4b. Progress + report files (sink_progress_file / end_reporting).
    graft.sink.Reports.writeProgress(marked, s"$storeRoot/.upload.out", 0.0)
    graft.sink.Reports.writeReport(results.toDF(), s"$storeRoot/.upload.report.log")

    // 5. Report (end_reporting): totals + percent + rate fields.
    marked.agg(
        count(lit(1)).as("total"),
        sum(when(col("uploaded"), 1).otherwise(0)).as("uploaded"),
        round(sum(when(col("uploaded"), 1).otherwise(0)) * 100.0 / count(lit(1)), 2)
          .as("pct_complete"))
      .crossJoin(results.agg(
        sum(when(!col("ok"), 1).otherwise(0)).as("failed"),
        max(col("attempts")).as("max_attempts")))
  }
}
