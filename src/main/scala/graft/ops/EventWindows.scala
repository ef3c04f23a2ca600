package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Stream-shaped window aggregations (SURVEY §2.12), expressed as batch
  * queries over `events` so they are DuckDB-oracle-checkable. The
  * streaming runner (`graft.streaming.Streams`) applies the same
  * transformations to a `readStream` DataFrame — logic is shared, only the
  * source/sink differ (this is the Structured Streaming unification).
  *
  * Grounding: the reference's `set_speed` poll loop (bulkupload.py:363-387)
  * is a 5-second tumbling rate; `.out` progress files are an
  * overwrite-in-place stream (bulkupload.py:334-338).
  */
object EventWindows {

  /** events per 5-second tumbling window (epoch-aligned, as Spark's
    * `window()` and DuckDB's `time_bucket` both are). */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** 60-second window sliding every 5 seconds (smoothed rate).
    * Single-aggregation form — the one a watermarked STREAM can run
    * (chained aggregations are not allowed in append mode); its Expand
    * emits 12 rows per EVENT. */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "60 seconds", "5 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Batch-optimized sliding rate, output-identical to [[sliding]]
    * (asserted in StreamsSpec): pre-aggregate per 5 s tumbling bucket
    * FIRST, then expand each bucket row into the 12 sliding windows
    * covering it and sum the partial counts. The 12× Expand runs over
    * ~n_buckets rows instead of n_events, and the first shuffle carries
    * bucket partials — at 100 TB that is the difference between
    * shuffling 12·n events and shuffling the (tiny) bucket histogram.
    * Exact because slide (5 s) divides width (60 s). */
  def slidingPreAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "5 seconds").as("w5"))
      .agg(count(lit(1)).as("pc"))
      .select(unix_micros(col("w5.start")).as("bs"), col("pc"))
      .withColumn("i", explode(sequence(lit(0L), lit(11L))))
      .groupBy(timestamp_micros(col("bs") - col("i") * lit(5000000L)).as("w_start"))
      .agg(sum(col("pc")).cast("long").as("n"))

  /** Per-user session windows with a 30-minute gap; end = last event +
    * gap, exactly Spark's session_window semantics. */
  def sessions(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_rate_tumbling" -> ((s, d) =>
      tumbling(Tables.events(s, d)).orderBy("w_start")),
    // set_speed's Δcount/Δt per 5 s window (bulkupload.py:381-384) —
    // the per-window rate, vs math_rate's whole-stream rate.
    "agg_rate" -> ((s, d) =>
      tumbling(Tables.events(s, d))
        .select(col("w_start"), col("n"),
          round(col("n") / 5.0, 6).as("per_sec"))
        .orderBy("w_start")),
    "stream_sliding" -> ((s, d) =>
      slidingPreAgg(Tables.events(s, d)).orderBy("w_start")),
    "stream_session" -> ((s, d) =>
      sessions(Tables.events(s, d)).orderBy("user_id", "s_start"))
  )

  def oracle: Map[String, String] = Map(
    "stream_rate_tumbling" ->
      """SELECT time_bucket(INTERVAL '5 seconds', ts) AS w_start, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "agg_rate" ->
      """SELECT w_start, n, round(n / 5.0, 6) AS per_sec FROM (
        |  SELECT time_bucket(INTERVAL '5 seconds', ts) AS w_start, count(*) AS n
        |  FROM events GROUP BY 1)
        |ORDER BY w_start""".stripMargin,
    // sliding window = each event contributes to the 12 5-second-aligned
    // windows covering it: w_start = bucket5(ts) - i*5s, i in 0..11.
    "stream_sliding" ->
      """SELECT w_start, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '5 seconds', ts)
        |         - i * INTERVAL '5 seconds' AS w_start
        |  FROM events, (SELECT unnest(range(0, 12)) AS i))
        |GROUP BY w_start ORDER BY w_start""".stripMargin,
    // gaps-and-islands; new session when gap >= 30 min (Spark's session
    // windows are [start, last+gap), so an exactly-30-min gap splits).
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS s_start,
        |       max(ts) + INTERVAL '30 minutes' AS s_end, count(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin
  )
}
