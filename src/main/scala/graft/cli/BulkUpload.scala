package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Manifest, PathFns}
import graft.sink.{LocalFsStore, ManifestStore, ObjectStore, Reports, RetryingStore, Uploader}

/** `bulkupload` — the reference CLI `python bulkupload.py <container>
  * <table> <n-processes> [path-cutoff]` (bulkupload.py:390-458) as one
  * Spark job graph.
  *
  * Flow parity (SURVEY §3.2): provision container → plan pending (WHERE
  * uploaded=0, bulkupload.py:357) → fan out (partitioning replaces the
  * locked shared queue) → per-file PUT with ≤5 attempts + reconnect
  * backoff → mark uploaded (snapshot join-swap) → progress/report files.
  * Object keys apply the documented cutoff-prefix + leading-slash rules
  * (bulkupload.py:48-56, both reference bugs fixed per SURVEY §2.8).
  * A re-run resumes: only still-pending rows upload (readme.md:42).
  */
object BulkUpload {

  final case class Summary(attempted: Long, uploaded: Long, failed: Long,
      totalUploaded: Long, total: Long)

  def run(spark: SparkSession, storeRoot: String, manifestRoot: String,
      parallelism: Int, cutoff: Option[String] = None,
      mkStore: String => ObjectStore =
        root => new RetryingStore(new LocalFsStore(root)),
      retrySleepMs: Long = 0L): Summary = {
    import spark.implicits._

    val store = mkStore(storeRoot)
    store.ensureContainer() // create_container, bulkupload.py:110-124

    val m = ManifestStore.read(spark, manifestRoot)
    val keyCol = {
      val cut = cutoff.map(c => PathFns.pathCutoff(col("path"), c))
        .getOrElse(col("path"))
      PathFns.stripLeadingSlash(cut)
    }
    val pending = Manifest.filterPending(m)
      .select(col("id"), col("path"), keyCol.as("key"))
      .as[(Long, String, String)]
      .map { case (id, path, key) =>
        (id, key, java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          new java.net.URI(path).getPath)))
      } // open(path, 'rb'), bulkupload.py:39 — executor-side per file

    val counters = Uploader.mkCounters(spark)
    val results = Uploader.upload(pending, () => mkStore(storeRoot),
      parallelism, maxAttempts = 5, retrySleepMs = retrySleepMs,
      counters = Some(counters)).toDF().cache()
    val attempted = results.count()

    val marked = Manifest.markUploaded(m, results.filter(col("ok"))).cache()
    marked.count()
    ManifestStore.swap(marked, manifestRoot)

    Uploader.writeErrorLog(results, s"$manifestRoot/.upload.error.log")
    Reports.writeProgress(marked, s"$manifestRoot/.upload.out", 0.0)
    Reports.writeReport(results, s"$manifestRoot/.upload.report.log")

    Summary(
      attempted = attempted,
      uploaded = counters.uploaded.value,
      failed = counters.failed.value,
      totalUploaded = marked.filter(col("uploaded")).count(),
      total = marked.count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: bulkupload <storeRoot> <manifestRoot> <parallelism> [cutoff]")
    val spark = Sessions.build()
    val s = run(spark, args(0), args(1), args(2).toInt, args.lift(3))
    println(s"[bulkupload] attempted=${s.attempted} uploaded=${s.uploaded} " +
      s"failed=${s.failed} total=${s.totalUploaded}/${s.total}")
    spark.stop()
  }
}
