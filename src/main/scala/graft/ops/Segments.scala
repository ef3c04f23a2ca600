package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** File segmentation (SURVEY §2.9): 1 row → N fixed-size chunk rows.
  *
  * Reference: `split_file` filesegmenter.py:4-42 — sequential read loop
  * writing `{name}-%04d.txt` chunks. Two deliberate divergences:
  * the reference opens files in text mode (":24,:37") which corrupts
  * binary data — we chunk on exact offsets; and it is single-threaded —
  * here each input row expands via `posexplode(sequence(...))`, a built-in
  * Generator, so chunking is embarrassingly parallel and stays inside
  * whole-stage codegen (no custom Generator needed).
  *
  * Scale note: at 100 TB the same plan holds — the explode is map-side
  * only (no shuffle); chunk count per row is data-dependent so AQE's
  * post-shuffle coalescing handles skew if a downstream exchange follows.
  */
object Segments {

  /** Expand `df` so each row yields ceil(len/size) segment rows.
    * `textCol` is chunked by character offsets (the binary equivalent
    * would use the same plan over a BinaryType column). */
  def segmentText(df: DataFrame, idCol: Column, textCol: Column, size: Int): DataFrame =
    df.select(
        idCol.as("doc_id"), textCol.as("_t"),
        posexplode(sequence(lit(0L),
          (ceil(length(textCol).cast("double") / size) - 1).cast("long"))))
      .select(col("doc_id"),
        col("pos").cast("long").as("seg_no"),
        format_string("%s-%04d.txt", concat(lit("doc_"), col("doc_id")),
          col("pos").cast("int")).as("seg_name"),
        substring(col("_t"), (col("pos") * size + 1).cast("int"), lit(size))
          .as("seg_text"))
      .withColumn("seg_len", length(col("seg_text")).cast("long"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "segment_file" -> ((s, d) =>
      segmentText(Tables.documents(s, d).filter(length(col("text")) > 0),
        col("doc_id"), col("text"), 500)
        .orderBy("doc_id", "seg_no"))
  )

  def oracle: Map[String, String] = Map(
    "segment_file" ->
      """SELECT doc_id,
        |       CAST(seg AS BIGINT) AS seg_no,
        |       printf('%s-%04d.txt', 'doc_' || doc_id, CAST(seg AS INT)) AS seg_name,
        |       substr(text, CAST(seg * 500 + 1 AS INT), 500) AS seg_text,
        |       CAST(length(substr(text, CAST(seg * 500 + 1 AS INT), 500)) AS BIGINT) AS seg_len
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, CAST(ceil(length(text) / 500.0) AS BIGINT))) AS seg
        |      FROM documents WHERE length(text) > 0)
        |ORDER BY doc_id, seg_no""".stripMargin
  )
}
