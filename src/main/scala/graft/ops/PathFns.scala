package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Scalar path/date/math functions (SURVEY §2.8) as pure `Column`
  * functions — all codegen'd builtins, no UDFs, so every one stays inside
  * WholeStageCodegen.
  *
  * Two reference bugs are deliberately NOT reproduced (SURVEY §2.8):
  *  - `path_cutoff` uses Python `lstrip(cutoff)` (bulkupload.py:50-51)
  *    which strips a *character set*; we implement the documented prefix
  *    semantics (readme.md:60-67).
  *  - the leading-slash check compares the whole path to "/"
  *    (bulkupload.py:53-56); we implement the documented startswith intent.
  */
object PathFns {

  /** Strip everything up to and including the first occurrence of `cutoff`
    * (plus one following '/') — documented semantics of the `path_cutoff`
    * CLI arg (readme.md:60-67, bulkupload.py:48-56). */
  def pathCutoff(path: Column, cutoff: String): Column =
    regexp_replace(path, "^.*?" + java.util.regex.Pattern.quote(cutoff) + "/?", "")

  /** Drop one leading '/' so folder structure is preserved on the store
    * (bulkupload.py:53-56, intent not bug). */
  def stripLeadingSlash(path: Column): Column =
    when(path.startsWith("/"), path.substr(lit(2), length(path))).otherwise(path)

  /** dir + name → path (prepareupload.py:32, filesegmenter.py:31-36). */
  def pathJoin(dir: Column, name: Column): Column = concat_ws("/", dir, name)

  /** Last path component (filesegmenter.py:14 `split('/')[-1]`). */
  def basename(path: Column): Column = substring_index(path, "/", -1)

  /** `{name}-%04d.txt` zero-padded segment names (filesegmenter.py:33-35). */
  def segmentName(name: Column, n: Column): Column =
    format_string("%s-%04d.txt", name, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_path_cutoff" -> ((s, d) =>
      Manifest.fromDocuments(s, d)
        .select(col("id"), pathCutoff(col("path"), "doc_").as("stripped"))
        .orderBy("id")),
    "str_leading_slash" -> ((s, d) =>
      Manifest.fromDocuments(s, d)
        .withColumn("abs", concat(lit("/"), col("path")))
        .select(col("id"),
          when(col("abs").startsWith("/"), col("abs").substr(lit(2), length(col("abs"))))
            .otherwise(col("abs")).as("rel"))
        .orderBy("id")),
    "str_path_join" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          pathJoin(col("source"), concat(lit("doc_"), col("doc_id"), lit(".txt")))
            .as("path"))
        .orderBy("doc_id")),
    "str_basename" -> ((s, d) =>
      Manifest.fromDocuments(s, d)
        .select(col("id"), basename(col("path")).as("base"))
        .orderBy("id")),
    "str_segment_name" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          segmentName(concat(lit("doc_"), col("doc_id")), (col("doc_id") % 20).cast("int"))
            .as("seg_name"))
        .orderBy("doc_id")),
    "date_fmt" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .orderBy("event_id")),
    "math_percent" -> ((s, d) => {
      val e = Tables.events(s, d)
      val total = e.agg(count(lit(1)).as("total"))
      e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select(col("event_type"), col("n"),
          round(col("n") * 100.0 / col("total"), 6).as("pct"))
        .orderBy("event_type")
    }),
    "math_rate" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             unix_micros(max(col("ts"))).as("max_us"),
             unix_micros(min(col("ts"))).as("min_us"))
        .select(col("event_type"),
          round(col("n") * lit(1000000.0) / (col("max_us") - col("min_us")), 6)
            .as("per_sec"))
        .orderBy("event_type")),
    "json_props" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"))
  )

  private val M =
    """WITH manifest AS (
      |  SELECT CAST(row_number() OVER (ORDER BY source || '/doc_' || doc_id || '.txt') AS BIGINT) AS id,
      |         source || '/doc_' || doc_id || '.txt' AS path
      |  FROM documents
      |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "str_path_cutoff" ->
      s"$M SELECT id, regexp_replace(path, '^.*?doc_/?', '') AS stripped FROM manifest ORDER BY id",
    "str_leading_slash" ->
      s"""$M SELECT id, CASE WHEN starts_with('/' || path, '/')
         | THEN substr('/' || path, 2) ELSE '/' || path END AS rel
         |FROM manifest ORDER BY id""".stripMargin,
    "str_path_join" ->
      """SELECT doc_id, concat_ws('/', source, 'doc_' || doc_id || '.txt') AS path
        |FROM documents ORDER BY doc_id""".stripMargin,
    "str_basename" ->
      s"$M SELECT id, string_split(path, '/')[-1] AS base FROM manifest ORDER BY id",
    "str_segment_name" ->
      """SELECT doc_id, printf('%s-%04d.txt', 'doc_' || doc_id, CAST(doc_id % 20 AS INT)) AS seg_name
        |FROM documents ORDER BY doc_id""".stripMargin,
    "date_fmt" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events ORDER BY event_id""".stripMargin,
    "math_percent" ->
      """SELECT event_type, count(*) AS n,
        |       round(count(*) * 100.0 / (SELECT count(*) FROM events), 6) AS pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "math_rate" ->
      """SELECT event_type,
        |       round(count(*) * 1000000.0 / (epoch_us(max(ts)) - epoch_us(min(ts))), 6) AS per_sec
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
