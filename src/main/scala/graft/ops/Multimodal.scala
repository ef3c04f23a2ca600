package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Multimodal column handling (SURVEY §2.13 `multimodal_binary`).
  *
  * Design: media (image/audio/video) are opaque `BinaryType` columns with
  * a typed metadata struct alongside — the payload never enters
  * expressions, only the decode/feature stage touches it, via
  * `mapPartitions` so a real decoder (JNI/subprocess) would amortize init
  * per partition exactly like the uploader's per-partition clients.
  *
  * The decode itself is STUBBED (no image/audio libs in this container):
  * [[FakeDecoded]] fields are a deterministic function of the bytes, so
  * the plumbing — schema, batch shape, partition-level init, column
  * pruning — is real and testable, and swapping in a true decoder changes
  * only the body of [[decodeStub]].
  */
object Multimodal {

  /** documents → (doc_id, content: binary, meta struct). The binary column
    * stands in for an image/audio payload. */
  def withBinaryContent(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang")).as("meta"))

  final case class FakeDecoded(doc_id: Long, width: Int, height: Int,
      n_frames: Int, n_bytes: Long)

  /** Deterministic stand-in for an image decode: width/height/frames
    * derived from payload size. A real implementation would decode
    * `content` here (per-partition decoder init). */
  def decodeStub(bin: DataFrame): Dataset[FakeDecoded] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "decoder" init would go here
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          FakeDecoded(id,
            width = (64 + n % 576).toInt,
            height = (64 + (n * 7) % 416).toInt,
            n_frames = (1 + id % 10).toInt,
            n_bytes = n)
        }
      }
  }

  /** Same fake-decode as pure Column expressions — the oracle-checkable
    * twin of [[decodeStub]] (equality asserted in MultimodalSpec). */
  def decodeStubExprs(bin: DataFrame): DataFrame =
    bin.select(col("doc_id"),
      (lit(64) + pmod(col("meta.n_bytes"), lit(576))).cast("int").as("width"),
      (lit(64) + pmod(col("meta.n_bytes") * 7, lit(416))).cast("int").as("height"),
      (lit(1) + pmod(col("doc_id"), lit(10))).cast("int").as("n_frames"),
      col("meta.n_bytes").as("n_bytes"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary payload + typed metadata: byte counts differ from char counts
    // on non-ASCII (zh) docs — that difference is the point.
    "multimodal_meta" -> ((s, d) =>
      withBinaryContent(Tables.documents(s, d))
        .select(col("doc_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"), col("meta.lang").as("lang"),
          length(col("content")).cast("long").as("content_len"))
        .orderBy("doc_id")),
    // expression twin of the mapPartitions decode (decode itself is
    // rows-only-checked via MultimodalSpec equality).
    "multimodal_decode_meta" -> ((s, d) =>
      decodeStubExprs(withBinaryContent(Tables.documents(s, d)))
        .orderBy("doc_id"))
  )

  def oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, lang,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS content_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_decode_meta" ->
      """SELECT doc_id,
        |       CAST(64 + octet_length(encode(text)) % 576 AS INT) AS width,
        |       CAST(64 + (octet_length(encode(text)) * 7) % 416 AS INT) AS height,
        |       CAST(1 + doc_id % 10 AS INT) AS n_frames,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
