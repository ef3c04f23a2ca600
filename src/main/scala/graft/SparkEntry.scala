package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2; keys that are
  * SQL-expressible also appear in [[oracleSql]] with DuckDB SQL producing
  * the *identical* result (same column names, same row order, same types
  * after Spark->parquet->DuckDB round-trip). Discipline for oracle parity:
  *   - every query ends with an ORDER BY on a unique key;
  *   - ids are row_number over an explicit ordering (never
  *     monotonically_increasing_id);
  *   - count()/sum(int) cast to BIGINT on the DuckDB side (DuckDB widens
  *     sum to HUGEINT);
  *   - double aggregates rounded (2 dp for money-scale sums, 4-6 dp for
  *     unit-scale values) on BOTH sides so FP summation order can't flip a
  *     hash;
  *   - WINDOWED float sums don't gate even rounded (measured: a trailing
  *     avg flipped 4 dp on ~1/10k rows) — gate selections (count/min/max),
  *     or make the arithmetic exact integer (fixed-point PageRank/HITS,
  *     audio sum-of-squares), or round BEFORE an order-pinned window
  *     (cohort LTV);
  *   - an iterative oracle whose round reads its previous CTE twice must
  *     mark those CTEs AS MATERIALIZED — DuckDB inlines CTEs, and the
  *     unrolled recurrence otherwise doubles per round (graph_hits).
  */
object SparkEntry {

  /** Flagship pipeline on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Oracle SQL building blocks (DuckDB dialect).
  // ---------------------------------------------------------------------

  /** The deterministic manifest CTE — must mirror Manifest.fromDocuments
    * (shared with the Jdbc/FileFormats source oracles). */
  private val M = graft.model.OracleSql.manifestCte

  // ---------------------------------------------------------------------
  // Query registry
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    manifestQueries ++ Relational.queries ++ Relational.windowQueries ++
      PathFns.queries ++ Segments.queries ++ Text.queries ++ Dedup.queries ++
      Similarity.queries ++ EventWindows.queries ++ Fingerprints.queries ++
      Multimodal.queries ++ graft.sources.FsScan.queries ++ AsOf.queries ++
      Scale.queries ++ graft.sources.Jdbc.queries ++
      graft.sources.FileFormats.queries ++ CorpusPrep.queries ++
      Sampling.queries ++ TermStats.queries ++ Profile.queries ++
      Graphs.queries

  def oracleSql: Map[String, String] =
    manifestOracle ++ Relational.oracle ++ Relational.windowOracle ++
      PathFns.oracle ++ Segments.oracle ++ Text.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ EventWindows.oracle ++ Fingerprints.oracle ++
      Multimodal.oracle ++ graft.sources.FsScan.oracle ++ AsOf.oracle ++
      Scale.oracle ++ graft.sources.Jdbc.oracle ++
      graft.sources.FileFormats.oracle ++ CorpusPrep.oracle ++
      Sampling.oracle ++ TermStats.oracle ++ Profile.oracle ++
      Graphs.oracle

  // ----- §2.1/2.2/2.3 (partial)/2.4 (partial)/2.6/2.7/2.10: manifest core

  /** The SCD2 versioned-history frame — shared by manifest_scd2 (the
    * upsert-as-append write) and manifest_time_travel (the as-of read),
    * so the two keys can never drift. Upsert: instead of overwriting
    * the uploaded flag, close the old version (valid_to = this batch)
    * and append the new one. Batch numbers, not wall-clock, stamp
    * validity (deterministic; at scale the ingest batch id is exactly
    * what a lakehouse history table carries). Plan: one BROADCAST of
    * the changed-id set against the snapshot (payload rows never
    * reshuffle) + a union of the (small) new-version rows — history
    * grows by the change volume, never by the snapshot size. */
  private def scd2History(s: SparkSession, d: String): DataFrame = {
    val m = Manifest.fromDocuments(s, d)
    val chg = broadcast(
      m.filter(col("id") % 4 === 0 && !col("uploaded"))
        .select(col("id"), lit(true).as("_new_uploaded")))
    val v1 = m.join(chg, Seq("id"), "left_outer")
      .select(col("id"), col("path"), col("uploaded"),
        lit(1L).as("version"), lit(1L).as("valid_from_batch"),
        when(col("_new_uploaded").isNotNull, 2L).as("valid_to_batch"),
        col("_new_uploaded").isNull.as("is_current"))
    val v2 = m.join(chg, Seq("id"))
      .select(col("id"), col("path"),
        col("_new_uploaded").as("uploaded"),
        lit(2L).as("version"), lit(2L).as("valid_from_batch"),
        lit(null).cast("long").as("valid_to_batch"),
        lit(true).as("is_current"))
    v1.unionByName(v2)
  }

  private def manifestQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "manifest_create" -> ((s, d) => Manifest.fromDocuments(s, d).orderBy("id")),
    "scan_manifest" -> ((s, d) => Manifest.scan(s, d)),
    "filter_pending" -> ((s, d) =>
      Manifest.filterPending(Manifest.fromDocuments(s, d)).orderBy("id")),
    "filter_uploaded" -> ((s, d) =>
      Manifest.filterUploaded(Manifest.fromDocuments(s, d)).orderBy("id")),
    "project_entry" -> ((s, d) =>
      Manifest.projectEntry(Manifest.fromDocuments(s, d)).orderBy("id")),
    "manifest_mark_uploaded" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      val ok = Manifest.filterPending(m).filter(col("id") % 5 === 0).select("id")
      Manifest.markUploaded(m, ok).select("id", "path", "uploaded").orderBy("id")
    }),
    // append new scan results; ids continue after the current max (the
    // AUTO_INCREMENT semantics of insert_path, olrcdb.py:54-70) — batched
    // set-append, not the reference's per-row INSERT+commit.
    "manifest_insert" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      val newScan = graft.model.Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(concat(lit("extra/doc_"), col("doc_id"), lit(".txt")).as("path"))
      val mx = m.agg(max(col("id")).as("_mx"))
      // appended ids via the distributed range form (same as the CLI's
      // prepare path), offset by the current max — no global window even
      // when the appended batch is itself large.
      val appended = Scale.assignIdsByRange(newScan, "path")
        .crossJoin(broadcast(mx))
        .select((col("_mx") + col("id")).as("id"),
          col("path"), lit(false).as("uploaded"))
      m.union(appended).orderBy("id")
    }),
    // MERGE/upsert in one pass — the reference's per-row INSERT +
    // UPDATE lifecycle (olrcdb.py insert_path; bulkupload.py mark) as a
    // single declarative plan: flag updates apply via a BROADCAST left
    // join (ids only — payload rows never reshuffle, same plan as
    // manifest_mark_uploaded), inserts append via the distributed
    // range-id form. No full-outer shuffle: at 100 TB the update batch
    // is small relative to the snapshot, which is exactly what makes
    // the broadcast + union decomposition the right MERGE plan.
    "manifest_merge_upsert" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      val updMark = broadcast(
        m.filter(col("id") % 4 === 0)
          .select(col("id"), lit(true).as("_mark")))
      val updated = m.join(updMark, Seq("id"), "left_outer")
        .select(col("id"), col("path"),
          coalesce(col("_mark"), col("uploaded")).as("uploaded"))
      val newScan = graft.model.Tables.documents(s, d)
        .filter(col("doc_id") <= 10)
        .select(concat(lit("newbatch/doc_"), col("doc_id"), lit(".txt"))
          .as("path"))
      val mx = m.agg(max(col("id")).as("_mx"))
      val inserted = Scale.assignIdsByRange(newScan, "path")
        .crossJoin(broadcast(mx))
        .select((col("_mx") + col("id")).as("id"), col("path"),
          lit(false).as("uploaded"))
      updated.unionByName(inserted).orderBy("id")
    }),
    // SCD2 history for the manifest — the audit-grade form of the
    // upsert: instead of overwriting the uploaded flag, close the old
    // version (valid_to = this batch) and append the new one. Batch
    // numbers, not wall-clock, stamp validity (deterministic, and at
    // scale the ingest batch id is exactly what a lakehouse history
    // table carries). Plan: one BROADCAST of the changed-id set against
    // the snapshot (payload rows never reshuffle) + a union of the
    // (small) new-version rows — history grows by the change volume,
    // never by the snapshot size.
    "manifest_scd2" -> ((s, d) =>
      scd2History(s, d).orderBy("id", "version")),
    // TIME TRAVEL over the versioned history: the manifest AS OF batch 1
    // and AS OF batch 2, resolved from the SAME SCD2 frame by the
    // validity predicate (valid_from <= b < valid_to) — the read side of
    // every versioned-table format. Plan: the as-of batch list is a
    // BROADCAST literal against the history (map-side predicate, no
    // shuffle of the snapshot); at 100 TB the history is partitioned by
    // valid_from_batch and the predicate prunes to the touched batches.
    "manifest_time_travel" -> ((s, d) => {
      val batches = broadcast(
        s.range(1, 3).select(col("id").as("as_of_batch")))
      scd2History(s, d)
        .join(batches,
          col("valid_from_batch") <= col("as_of_batch") &&
            (col("valid_to_batch").isNull ||
              col("valid_to_batch") > col("as_of_batch")))
        .select(col("as_of_batch"), col("id"), col("uploaded"),
          col("version"))
        .orderBy("as_of_batch", "id")
    }),
    // SNAPSHOT DIFF — the table-diff audit between two manifest
    // generations (what changed between yesterday's scan and today's):
    // generation B deterministically deletes id % 13 = 0, flips the
    // uploaded flag on id % 4 = 0 survivors, and appends a new batch.
    // Plan: ONE full-outer equi-join on the snapshot key classifying
    // added / deleted / changed rows map-side; unchanged rows are
    // filtered before the ORDER BY so the diff output (and any sink it
    // feeds) scales with the CHANGE volume. At 100 TB both generations
    // bucket by id and the join is exchange-free.
    "manifest_diff" -> ((s, d) => {
      val a = Manifest.fromDocuments(s, d)
      val survivors = a.filter(col("id") % 13 =!= 0)
        .select(col("id"), col("path"),
          when(col("id") % 4 === 0, !col("uploaded"))
            .otherwise(col("uploaded")).as("uploaded"))
      val mx = a.agg(max(col("id")).as("_mx"))
      val appended = Scale.assignIdsByRange(
          graft.model.Tables.documents(s, d).filter(col("doc_id") <= 7)
            .select(concat(lit("gen2/doc_"), col("doc_id"), lit(".txt"))
              .as("path")), "path")
        .crossJoin(broadcast(mx))
        .select((col("_mx") + col("id")).as("id"), col("path"),
          lit(false).as("uploaded"))
      val b = survivors.unionByName(appended)
      a.select(col("id"), col("path").as("a_path"),
          col("uploaded").as("a_up"))
        .join(b.select(col("id"), col("path").as("b_path"),
          col("uploaded").as("b_up")), Seq("id"), "full_outer")
        .withColumn("change",
          when(col("b_path").isNull, "deleted")
            .when(col("a_path").isNull, "added")
            .when(col("a_up") =!= col("b_up") || col("a_path") =!= col("b_path"),
              "changed"))
        .filter(col("change").isNotNull)
        .select(col("id"), col("change"),
          coalesce(col("b_path"), col("a_path")).as("path"),
          col("a_up"), col("b_up"))
        .orderBy("id")
    }),
    "join_anti_resume" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      Manifest.antiResume(m.select("path"), Manifest.filterUploaded(m).select("path"))
        .orderBy("path")
    }),
    "join_semi_uploaded" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      Manifest.semiUploaded(m.select("path"), Manifest.filterUploaded(m).select("path"))
        .orderBy("path")
    }),
    "agg_count_total" -> ((s, d) =>
      Manifest.fromDocuments(s, d).agg(count(lit(1)).as("n"))),
    "agg_count_uploaded" -> ((s, d) =>
      Manifest.fromDocuments(s, d)
        .agg(count(when(col("uploaded"), 1)).as("n_uploaded"))),
    "agg_min_pending" -> ((s, d) =>
      Manifest.filterPending(Manifest.fromDocuments(s, d))
        .agg(min("id").as("min_id"))),
    "agg_percent_complete" -> ((s, d) =>
      Manifest.fromDocuments(s, d).agg(
        round(sum(when(col("uploaded"), 1).otherwise(0)) * 100.0 / count(lit(1)), 6)
          .as("pct"))),
    "sort_by_id_desc" -> ((s, d) =>
      Manifest.fromDocuments(s, d).orderBy(desc("id"))),
    "set_except_pending" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      m.except(Manifest.filterUploaded(m)).orderBy("id")
    }),
    "set_union_logs" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      m.filter(col("id") % 7 === 0).select("path")
        .union(m.filter(col("id") % 11 === 0).select("path"))
        .orderBy("path")
    }),
    "set_intersect" -> ((s, d) => {
      val m = Manifest.fromDocuments(s, d)
      Manifest.filterUploaded(m).select("id", "path")
        .intersect(m.filter(col("id") % 2 === 0).select("id", "path"))
        .orderBy("id")
    })
  )

  /** The SCD2 history CTE chain (chg + hist) — mirrors [[scd2History]];
    * shared by the manifest_scd2 and manifest_time_travel oracles. */
  private val sqlScd2Hist: String =
    """chg AS (
      |  SELECT id FROM manifest WHERE id % 4 = 0 AND NOT uploaded),
      |hist AS (
      |  SELECT m.id, m.path, m.uploaded,
      |         CAST(1 AS BIGINT) AS version,
      |         CAST(1 AS BIGINT) AS valid_from_batch,
      |         CASE WHEN c.id IS NOT NULL THEN CAST(2 AS BIGINT) END
      |           AS valid_to_batch,
      |         c.id IS NULL AS is_current
      |  FROM manifest m LEFT JOIN chg c ON m.id = c.id
      |  UNION ALL
      |  SELECT m.id, m.path, true, CAST(2 AS BIGINT), CAST(2 AS BIGINT),
      |         CAST(NULL AS BIGINT), true
      |  FROM manifest m JOIN chg c ON m.id = c.id)""".stripMargin

  private def manifestOracle: Map[String, String] = Map(
    "manifest_create" -> s"$M SELECT id, path, uploaded FROM manifest ORDER BY id",
    "scan_manifest" -> s"$M SELECT id, path, uploaded FROM manifest ORDER BY id",
    "filter_pending" ->
      s"$M SELECT id, path, uploaded FROM manifest WHERE NOT uploaded ORDER BY id",
    "filter_uploaded" ->
      s"$M SELECT id, path, uploaded FROM manifest WHERE uploaded ORDER BY id",
    "project_entry" -> s"$M SELECT id, path FROM manifest ORDER BY id",
    "manifest_mark_uploaded" ->
      s"""$M, results AS (SELECT id FROM manifest WHERE NOT uploaded AND id % 5 = 0)
         |SELECT m.id, m.path, (m.uploaded OR r.id IS NOT NULL) AS uploaded
         |FROM manifest m LEFT JOIN results r ON m.id = r.id ORDER BY m.id""".stripMargin,
    "manifest_insert" ->
      s"""$M, newscan AS (
         |  SELECT 'extra/doc_' || doc_id || '.txt' AS path FROM documents
         |  WHERE doc_id % 10 = 0),
         |appended AS (
         |  SELECT (SELECT max(id) FROM manifest)
         |           + CAST(row_number() OVER (ORDER BY path) AS BIGINT) AS id,
         |         path, false AS uploaded
         |  FROM newscan)
         |SELECT id, path, uploaded FROM manifest
         |UNION ALL SELECT id, path, uploaded FROM appended
         |ORDER BY id""".stripMargin,
    "manifest_merge_upsert" ->
      s"""$M, updated AS (
         |  SELECT id, path,
         |         CASE WHEN id % 4 = 0 THEN true ELSE uploaded END AS uploaded
         |  FROM manifest),
         |newscan AS (
         |  SELECT 'newbatch/doc_' || doc_id || '.txt' AS path FROM documents
         |  WHERE doc_id <= 10),
         |inserted AS (
         |  SELECT (SELECT max(id) FROM manifest)
         |           + CAST(row_number() OVER (ORDER BY path) AS BIGINT) AS id,
         |         path, false AS uploaded
         |  FROM newscan)
         |SELECT id, path, uploaded FROM updated
         |UNION ALL SELECT id, path, uploaded FROM inserted
         |ORDER BY id""".stripMargin,
    "manifest_scd2" ->
      s"""$M, $sqlScd2Hist
         |SELECT id, path, uploaded, version, valid_from_batch,
         |       valid_to_batch, is_current
         |FROM hist ORDER BY id, version""".stripMargin,
    // as-of resolution over the SAME hist CTE as manifest_scd2.
    "manifest_time_travel" ->
      s"""$M, $sqlScd2Hist,
         |b AS (SELECT unnest(range(1, 3)) AS as_of_batch)
         |SELECT CAST(b.as_of_batch AS BIGINT) AS as_of_batch, h.id,
         |       h.uploaded, h.version
         |FROM hist h JOIN b ON h.valid_from_batch <= b.as_of_batch
         |  AND (h.valid_to_batch IS NULL OR h.valid_to_batch > b.as_of_batch)
         |ORDER BY as_of_batch, h.id""".stripMargin,
    "manifest_diff" ->
      s"""$M, b AS (
         |  SELECT id, path,
         |         CASE WHEN id % 4 = 0 THEN NOT uploaded ELSE uploaded END
         |           AS uploaded
         |  FROM manifest WHERE id % 13 <> 0
         |  UNION ALL
         |  SELECT (SELECT max(id) FROM manifest)
         |           + CAST(row_number() OVER (ORDER BY path) AS BIGINT),
         |         path, false
         |  FROM (SELECT 'gen2/doc_' || doc_id || '.txt' AS path
         |        FROM documents WHERE doc_id <= 7)),
         |d AS (
         |  SELECT coalesce(a.id, b.id) AS id,
         |         CASE WHEN b.id IS NULL THEN 'deleted'
         |              WHEN a.id IS NULL THEN 'added'
         |              WHEN a.uploaded <> b.uploaded OR a.path <> b.path
         |                THEN 'changed' END AS change,
         |         coalesce(b.path, a.path) AS path,
         |         a.uploaded AS a_up, b.uploaded AS b_up
         |  FROM manifest a FULL OUTER JOIN b ON a.id = b.id)
         |SELECT id, change, path, a_up, b_up FROM d
         |WHERE change IS NOT NULL ORDER BY id""".stripMargin,
    "join_anti_resume" ->
      s"""$M SELECT path FROM manifest m
         |WHERE NOT EXISTS (SELECT 1 FROM manifest u WHERE u.uploaded AND u.path = m.path)
         |ORDER BY path""".stripMargin,
    "join_semi_uploaded" ->
      s"""$M SELECT path FROM manifest m
         |WHERE EXISTS (SELECT 1 FROM manifest u WHERE u.uploaded AND u.path = m.path)
         |ORDER BY path""".stripMargin,
    "agg_count_total" -> s"$M SELECT count(*) AS n FROM manifest",
    "agg_count_uploaded" ->
      s"$M SELECT count(CASE WHEN uploaded THEN 1 END) AS n_uploaded FROM manifest",
    "agg_min_pending" ->
      s"$M SELECT min(id) AS min_id FROM manifest WHERE NOT uploaded",
    "agg_percent_complete" ->
      s"""$M SELECT round(CAST(sum(CASE WHEN uploaded THEN 1 ELSE 0 END) AS BIGINT) * 100.0
         | / count(*), 6) AS pct FROM manifest""".stripMargin,
    "sort_by_id_desc" ->
      s"$M SELECT id, path, uploaded FROM manifest ORDER BY id DESC",
    "set_except_pending" ->
      s"""$M SELECT id, path, uploaded FROM manifest
         |EXCEPT SELECT id, path, uploaded FROM manifest WHERE uploaded
         |ORDER BY id""".stripMargin,
    "set_union_logs" ->
      s"""$M SELECT path FROM (
         |  SELECT path FROM manifest WHERE id % 7 = 0
         |  UNION ALL SELECT path FROM manifest WHERE id % 11 = 0
         |) ORDER BY path""".stripMargin,
    "set_intersect" ->
      s"""$M SELECT id, path FROM manifest WHERE uploaded
         |INTERSECT SELECT id, path FROM manifest WHERE id % 2 = 0
         |ORDER BY id""".stripMargin
  )

}
