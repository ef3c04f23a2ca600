package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.RollingHash.{rolling_hash, rolling_hash_windows}
import graft.model.Tables

/** Document fingerprinting via the native rolling-hash expressions
  * (SURVEY §2.13; see graft.functions.RollingHash for the Catalyst
  * implementation). The windowed form + min is the winnowing scheme used
  * for near-dup detection at corpus scale: one O(n) map-side pass per
  * document, fingerprints shuffle instead of text.
  */
object Fingerprints {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // whole-document Karp-Rabin fingerprint (custom codegen expression).
    "fingerprint_rolling" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), rolling_hash(col("text")).as("fp"))
        .orderBy("doc_id")),
    // winnowing-style: all 8-gram window hashes, keep count/min/first.
    "fingerprint_winnow" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) >= 8)
        .withColumn("wins", rolling_hash_windows(col("text"), 8))
        .select(col("doc_id"),
          size(col("wins")).cast("long").as("n_windows"),
          array_min(col("wins")).as("min_hash"),
          element_at(col("wins"), 1).as("first_hash"))
        .orderBy("doc_id"))
  )

  // DuckDB replicates the identical fold in BIGINT (no overflow: acc<1e9,
  // acc*131+cp < 2^63) — validated char-for-char incl. CJK codepoints.
  private val foldSql =
    "(acc, x) -> (acc * 131 + x) % 1000000007"
  private def hashOf(expr: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($expr, ''), c -> CAST(unicode(c) AS BIGINT))),
       |  $foldSql)""".stripMargin

  def oracle: Map[String, String] = Map(
    "fingerprint_rolling" ->
      s"""SELECT doc_id, ${hashOf("text")} AS fp
         |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin,
    "fingerprint_winnow" ->
      s"""WITH wins AS (
         |  SELECT doc_id,
         |         list_transform(range(1, length(text) - 6),
         |           i -> ${hashOf("substr(text, CAST(i AS INT), 8)")}) AS w
         |  FROM documents WHERE length(text) >= 8)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_windows,
         |       list_min(w) AS min_hash, w[1] AS first_hash
         |FROM wins ORDER BY doc_id""".stripMargin
  )
}
