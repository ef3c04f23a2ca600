package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Scale
import graft.sink.{ManifestStore, Reports}
import graft.sources.FsScan

/** `prepareupload` — the reference CLI `python prepareupload.py
  * <directory> <table>` (prepareupload.py:63-104) as one Spark batch job.
  *
  * Reference behavior: recursive walk, one INSERT+commit per file (the
  * scaling bottleneck, SURVEY §3.1), duplicate rows on re-run (no
  * uniqueness, olrcdb.py:39-44). Here: one distributed `binaryFile`
  * listing, one manifest snapshot write; a re-run appends only paths not
  * yet indexed (`join_anti_resume`) — the documented intent, with the
  * duplicate-insert defect fixed and noted.
  */
object PrepareUpload {

  final case class Summary(indexed: Long, appended: Long, total: Long)

  def run(spark: SparkSession, dir: String, manifestRoot: String): Summary = {
    val scanned = FsScan.scanRecursive(spark, dir).select("path")
    val (newPaths, existing): (DataFrame, Option[DataFrame]) =
      if (ManifestStore.exists(manifestRoot)) {
        val m = ManifestStore.read(spark, manifestRoot)
        (scanned.join(m.select("path"), Seq("path"), "left_anti"), Some(m))
      } else (scanned, None)

    // ids continue after the current max; assignment is the distributed
    // range-partition form (Scale.assignIdsByRange), not a global window.
    // max(id) over an empty manifest is NULL (a prior run can legitimately
    // snapshot an empty tree) — coalesce to 0, and never conflate max(id)
    // with row count: ids stay dense only absent deletes.
    val base = existing.map(m =>
      m.agg(coalesce(max(col("id")), lit(0L))).head().getLong(0)).getOrElse(0L)
    val existingCount = existing.map(_.count()).getOrElse(0L)
    val appended = Scale.assignIdsByRange(newPaths, "path")
      .select((col("id") + base).as("id"), col("path"),
        lit(false).as("uploaded"))
    val next = existing match {
      case Some(m) => m.unionByName(appended)
      case None => appended
    }
    val counted = next.cache()
    val total = counted.count()
    val nAppended = total - existingCount
    ManifestStore.swap(counted, manifestRoot)
    counted.unpersist()
    Reports.overwrite(s"$manifestRoot/.prepare.out",
      s"${Reports.utcNow()} UTC: $nAppended files indexed, $total total")
    Summary(indexed = nAppended, appended = nAppended, total = total)
  }

  def main(args: Array[String]): Unit = {
    val Array(dir, manifestRoot) = args.take(2)
    val spark = Sessions.build()
    val s = run(spark, dir, manifestRoot)
    println(s"[prepareupload] indexed=${s.indexed} total=${s.total}")
    spark.stop()
  }
}

private[cli] object Sessions {
  def build(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
