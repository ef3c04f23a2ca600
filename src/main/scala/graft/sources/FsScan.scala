package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Filesystem-tree source (SURVEY §2.1 `scan_fs_recursive`).
  *
  * Reference: the recursive `os.listdir`/`isfile` walk of
  * prepareupload.py:21-60 — one Python process, one stat per file, one
  * MySQL INSERT+commit per file. Spark-native replacement: the
  * `binaryFile` DataSource with `recursiveFileLookup` — directory
  * listing is distributed, files become rows (path, modificationTime,
  * length, content), directories are excluded by the source itself
  * (predicate_isfile), and `content` is only materialized when the
  * column is selected (scan pruning).
  */
object FsScan {

  /** Recursive scan of a directory tree; content column excluded so the
    * scan reads metadata only — column pruning means no file is ever
    * OPENED, the tasks just emit (path, length, mtime) from the
    * listing. binaryFile still bin-packs splits per file with the 4 MB
    * phantom open cost, so a tree of N tiny files plans ~N/32 tasks
    * whose per-task scheduler constant dominates a zero-IO projection
    * (measured: 50k files → ~1,600 tasks → 11.0 s at sf1, 19× the
    * sf0.1 cost — the classic small-files pathology, r15). coalesce
    * to machine parallelism merges splits WITHOUT a shuffle: the same
    * listing emits through ~32 tasks. Correct at any scale for THIS
    * projection because the per-row work is metadata-only; a scan
    * that reads `content` should not coalesce (it wants the
    * bin-packed parallelism) — which is why the coalesce lives here
    * and not in a conf. */
  def scanRecursive(spark: SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"), col("length"), col("modificationTime"))
      .coalesce(spark.sparkContext.defaultParallelism)

  /** Materialize the documents table as a real file tree
    * (root/<source>/doc_<id>.txt, UTF-8) — executor-side writes, one
    * partition per task, used to exercise the scan against a knowable
    * oracle. */
  def writeDocsAsFiles(spark: SparkSession, dir: String, root: String): Unit = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), concat(lit("doc_"), col("doc_id"), lit(".txt")).as("base"),
        col("text"))
    docs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val rootPath = java.nio.file.Paths.get(root)
      it.foreach { r =>
        val p = rootPath.resolve(r.getString(0)).resolve(r.getString(1))
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, r.getString(2).getBytes("UTF-8"))
      }
    }
  }

  /** The materialized tree is memoized per sf dir: the registry query
    * stays pure-after-first-call (ContractSpec runs it twice for
    * determinism; Bench/Verify each run it once) instead of re-writing —
    * and leaking — a fresh temp tree per invocation. */
  private val treeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // write the docs as a nested file tree (once), then recursive-scan it
    // back: (basename, byte length) must round-trip exactly.
    "scan_fs_recursive" -> ((s, d) => {
      val root = treeMemo.computeIfAbsent(d, { dir =>
        val r = java.nio.file.Files.createTempDirectory("graft-fsscan").toString
        writeDocsAsFiles(s, dir, r)
        // keyed by dir (not session): evict + delete when the session that
        // materialized the tree ends — one session per JVM outside tests.
        graft.ops.SessionCleanup.onEnd(s) {
          treeMemo.remove(dir)
          graft.ops.SessionCleanup.deleteRecursively(r)
        }
        r
      })
      scanRecursive(s, root)
        .select(element_at(split(col("path"), "/"), -1).as("base"),
          col("length").as("flen"))
        .orderBy("base")
    })
  )

  def oracle: Map[String, String] = Map(
    "scan_fs_recursive" ->
      """SELECT 'doc_' || doc_id || '.txt' AS base,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS flen
        |FROM documents ORDER BY base""".stripMargin
  )
}
