package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** As-of (temporal) join: for each left row, the latest right row with the
  * same key and right.ts <= left.ts.
  *
  * Spark-first form: instead of a per-row range join (which plans as a
  * nested-loop or an exploding theta join), tag both sides, union them,
  * and carry the right payload forward with `last(_, ignoreNulls)` over a
  * (key) partition ordered by (ts, tag) — right rows sort before left rows
  * at equal ts, giving the <= semantics. ONE shuffle on the key, linear
  * scan per partition, no join explosion: this is the plan that survives
  * 100 TB (both sides hash-cluster by key; the window is a sorted
  * single pass). The right payload travels as one struct so all its
  * fields come from the same matched row atomically.
  *
  * The oracle is DuckDB's native ASOF JOIN — semantics equality is
  * hash-checked, not assumed. Right side must be unique per (key, ts)
  * (pre-dedup in the caller, mirrored in the oracle SQL).
  */
object AsOf {

  /** @param rightPayload right-column -> output-field-name mapping carried
    *        to matched left rows (becomes nullable on no match). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, rightPayload: Map[String, String]): DataFrame = {
    val payload = struct(rightPayload.toSeq.sortBy(_._2).map {
      case (c, n) => col(c).as(n)
    }: _*)
    val rSlim = right.select(
      (keys.map(col) :+ col(ts) :+ payload.as("_p")): _*)
      .withColumn("_tag", lit(0))
    val lTagged = left.withColumn("_tag", lit(1))
    val u = lTagged.unionByName(rSlim, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_p")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // each error event ⟶ the user's most recent click at-or-before it
    // (inner semantics: errors with no prior click drop, like DuckDB ASOF).
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "ts").orderBy(desc("event_id"))))
        .filter(col("rn") === 1)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      joinAsOf(errors, clicks, Seq("user_id"), "ts",
        Map("ts" -> "click_ts", "value" -> "click_value"))
        .filter(col("_asof").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("_asof.click_ts").as("click_ts"),
          col("_asof.click_value").as("click_value"))
        .orderBy("event_id")
    }),
    // TOLERANCE-bounded as-of: the production form ("a quote older than
    // the lookback is stale — no match") — the SAME single-shuffle
    // union+window plan plus one map-side recency filter on the carried
    // payload; "latest ≤ ts" within the window IS "latest within the
    // window", so no second search is needed.
    "join_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "ts").orderBy(desc("event_id"))))
        .filter(col("rn") === 1)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      joinAsOf(errors, clicks, Seq("user_id"), "ts",
        Map("ts" -> "click_ts", "value" -> "click_value"))
        .filter(col("_asof").isNotNull &&
          col("_asof.click_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("_asof.click_ts").as("click_ts"),
          col("_asof.click_value").as("click_value"))
        .orderBy("event_id")
    }),
    // NEAREST-either-direction as-of: the closest click in absolute time,
    // ties to the BACKWARD side. Composed from TWO sorted single-pass
    // as-ofs (the same union+window machinery run forward and, via
    // negated microseconds, backward) + a map-side pick — never a
    // per-user pair join: at 100 TB both passes are one key-shuffle each
    // and the candidate set per error is exactly two rows.
    "join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "ts").orderBy(desc("event_id"))))
        .filter(col("rn") === 1)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val back = joinAsOf(errors, clicks, Seq("user_id"), "ts",
          Map("ts" -> "click_ts", "value" -> "click_value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("_asof").as("_b"))
      val errN = errors.withColumn("tsn", -unix_micros(col("ts")))
      val clkN = clicks.withColumn("tsn", -unix_micros(col("ts")))
      val fwd = joinAsOf(errN, clkN, Seq("user_id"), "tsn",
          Map("ts" -> "click_ts", "value" -> "click_value"))
        .select(col("event_id"), col("_asof").as("_f"))
      back.join(fwd, Seq("event_id"))
        .withColumn("db",
          unix_micros(col("ts")) - unix_micros(col("_b.click_ts")))
        .withColumn("df",
          unix_micros(col("_f.click_ts")) - unix_micros(col("ts")))
        .withColumn("pick",
          when(col("_b").isNull, col("_f"))
            .when(col("_f").isNull, col("_b"))
            .when(col("db") <= col("df"), col("_b"))
            .otherwise(col("_f")))
        .filter(col("pick").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("pick.click_ts").as("click_ts"),
          col("pick.click_value").as("click_value"))
        .orderBy("event_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "join_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |           ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        |e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, e.ts, c.ts AS click_ts,
        |       c.value AS click_value
        |FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,
    // native ASOF picks the latest ≤ ts; the WHERE drops stale matches —
    // identical semantics to the Spark-side recency filter. The match
    // CTE is MATERIALIZED because DuckDB otherwise pushes the recency
    // predicate into the ASOF join and rejects the second inequality.
    "join_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |           ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        |e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |m AS MATERIALIZED (
        |  SELECT e.event_id, e.user_id, e.ts, c.ts AS click_ts,
        |         c.value AS click_value
        |  FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts)
        |SELECT * FROM m WHERE click_ts >= ts - INTERVAL 1 HOUR
        |ORDER BY event_id""".stripMargin,
    // the executable SPEC of the two-pass composition: all (error, click)
    // pairs per user ranked by (|Δt|, backward-first, click_ts) — the
    // fwd flag reproduces the ties-to-backward pick, and the deduped
    // clicks make the ordering total.
    "join_asof_nearest" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, ts
        |           ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        |e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |cand AS (
        |  SELECT e.event_id, e.user_id, e.ts, c.ts AS click_ts,
        |         c.value AS click_value,
        |         abs(epoch_us(e.ts) - epoch_us(c.ts)) AS dist,
        |         CASE WHEN c.ts <= e.ts THEN 0 ELSE 1 END AS fwd
        |  FROM e JOIN c ON e.user_id = c.user_id)
        |SELECT event_id, user_id, ts, click_ts, click_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_id
        |        ORDER BY dist, fwd, click_ts) AS rn FROM cand)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin
  )
}
