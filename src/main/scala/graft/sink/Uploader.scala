package graft.sink

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator
import graft.model.UploadResult

/** Parallel upload layer (SURVEY §2.11).
  *
  * Reference: N forked worker processes popping a locked shared queue
  * (bulkupload.py:421-440, 171-185), ≤5 attempts per file with 1 s sleep
  * (bulkupload.py:187-202), shared `Value` counters (bulkupload.py:409-416).
  *
  * Spark design: the "queue" is the partitioning itself — `repartition(n)`
  * hands each task a disjoint slice, no user-level locking; a dead task is
  * re-run by the scheduler (`spark.task.maxFailures`), which the reference
  * cannot do (a dead worker loses its popped entry). Counters are
  * `LongAccumulator`s (driver-read only); authoritative counts come from
  * the returned results Dataset, not the accumulators.
  *
  * Scale note: results are a Dataset the size of the *pending set ids*,
  * never the payload; at 1000 executors the only coordination is the final
  * (tiny) results shuffle into `Manifest.markUploaded`.
  */
object Uploader {

  final case class Counters(uploaded: LongAccumulator, failed: LongAccumulator)

  def mkCounters(spark: SparkSession): Counters = Counters(
    spark.sparkContext.longAccumulator("uploaded"),
    spark.sparkContext.longAccumulator("failed"))

  /** Upload `(id, key, bytes)` rows via a per-partition store client.
    * At-least-once: the PUT happens before the result row exists, so a
    * crash between = re-upload on resume (bulkupload.py:193-197 ordering;
    * idempotent PUT makes the retry safe). */
  def upload(
      pending: Dataset[(Long, String, Array[Byte])],
      mkStore: () => ObjectStore,
      parallelism: Int,
      maxAttempts: Int = 5,
      retrySleepMs: Long = 0L,
      counters: Option[Counters] = None): Dataset[UploadResult] = {
    val spark = pending.sparkSession
    import spark.implicits._
    pending.repartition(parallelism).mapPartitions { it =>
      val store = mkStore()
      it.map { case (id, key, bytes) =>
        var attempt = 0
        var lastErr: String = ""
        var ok = false
        while (!ok && attempt < maxAttempts) {
          attempt += 1
          try { store.put(key, bytes); ok = true }
          catch {
            case e: Exception =>
              lastErr = String.valueOf(e.getMessage)
              if (attempt < maxAttempts && retrySleepMs > 0)
                Thread.sleep(retrySleepMs)
          }
        }
        counters.foreach { c =>
          if (ok) c.uploaded.add(1) else c.failed.add(1)
        }
        UploadResult(id, ok, attempt, if (ok) "" else lastErr)
      }
    }
  }

  /** Failed rows as an appendable error log (sink_error_log,
    * prepareupload.py:47-49 / bulkupload.py:217-221). */
  def writeErrorLog(results: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    results.filter(!col("ok"))
      .select(concat_ws("\t", col("id"), col("error")).as("value"))
      .write.mode("append").text(path)
  }
}
