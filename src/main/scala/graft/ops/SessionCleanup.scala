package graft.ops

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-session cleanup registry for memoized one-time side effects.
  *
  * Several memos pay a setup cost once per (session, sf dir) — the derived
  * manifest cache (Manifest.fromDocuments), the embedded Derby database
  * (Jdbc.ensureLoaded), the materialized file tree (FsScan), bucketed
  * tables (Scale), trained IVF centroids (Similarity) — which is the right
  * amortization at 100 TB, but a long-lived JVM that churns sessions would
  * otherwise accumulate cached frames, temp directories, and strong
  * references to stopped sessions forever.
  *
  * Every memo registers an action here at creation time; actions run on
  * `SparkListenerApplicationEnd` (i.e. when the owning SparkContext
  * stops — CONTEXT granularity: sessions sharing one context are cleaned
  * together at context stop, which covers the Bench/Verify/test JVMs
  * where one context spans the run) and drop the memo entry, unpersist
  * the cache, and delete the temp residue. Actions are best-effort (each
  * wrapped in try) because the context is mid-shutdown when they fire;
  * every registered action is therefore RECREATE-SAFE — memos repopulate
  * lazily if queried again after a drain (asserted in
  * SessionCleanupSpec, which drains the live registry mid-session).
  */
object SessionCleanup {

  private val actions = new java.util.concurrent.ConcurrentHashMap[
    SparkContext, java.util.concurrent.ConcurrentLinkedQueue[() => Unit]]()

  /** Register `f` to run when `s`'s SparkContext ends. The listener is
    * installed once per context (on first registration). */
  def onEnd(s: SparkSession)(f: => Unit): Unit = {
    val sc = s.sparkContext
    val q = actions.computeIfAbsent(sc, { c =>
      c.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          drain(c)
      })
      new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
    })
    q.add(() => f)
  }

  /** Run and drop everything registered for `sc` (idempotent; exposed so
    * specs can force a drain without stopping the shared test session). */
  def drain(sc: SparkContext): Unit = {
    val q = actions.remove(sc)
    if (q != null) q.forEach { f =>
      try f() catch { case _: Throwable => () }
    }
  }

  /** Pending-action count for `s` — spec observability. */
  def pending(s: SparkSession): Int = {
    val q = actions.get(s.sparkContext)
    if (q == null) 0 else q.size()
  }

  /** Best-effort recursive delete of a temp directory. */
  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach { f =>
          try java.nio.file.Files.deleteIfExists(f)
          catch { case _: Throwable => () }
        }
      finally walk.close()
    }
  }
}
