package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row
      (4L, 20L, ts("2024-01-01 10:00:00"))  // equal-ts match
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (20L, ts("2024-01-01 10:00:00"), 9.0)
    ).toDF("user_id", "ts", "value")

    val got = AsOf.joinAsOf(left, right, Seq("user_id"), "ts",
        Map("value" -> "v"))
      .select(col("event_id"), col("_asof.v"))
      .as[(Long, Option[Double])].collect().toMap

    assert(got(1L).contains(1.0)) // 10:00 -> 09:00 row
    assert(got(2L).contains(2.0)) // 12:00 -> 11:00 row
    assert(got(3L).isEmpty)       // nothing at-or-before 08:00
    assert(got(4L).contains(9.0)) // ts equality counts (<=)
  }

  test("tolerance-bounded as-of: matches outside the lookback become " +
      "non-matches; everything else equals the plain as-of") {
    val tol = AsOf.queries("join_asof_tolerance")(spark, TestSpark.sf0001)
      .select("event_id", "ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect()
    val plain = AsOf.queries("join_asof")(spark, TestSpark.sf0001)
      .select("event_id", "ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect()
    val plainById = plain.map(t => t._1 -> t).toMap
    // subset with identical matches
    tol.foreach { case (id, t, ct) =>
      assert(plainById(id) == ((id, t, ct)), s"event $id")
      assert(t.getTime - ct.getTime <= 3600 * 1000L, s"event $id stale")
    }
    // the bound does observable work: the plain join has stale matches
    val stale = plain.count { case (_, t, ct) =>
      t.getTime - ct.getTime > 3600 * 1000L }
    assert(stale > 0 && tol.length == plain.length - stale)
  }

  test("join_asof_nearest: at least as close as the backward match, covers " +
      "forward-only errors, and actually uses the forward direction") {
    val near = AsOf.queries("join_asof_nearest")(spark, TestSpark.sf0001)
      .select("event_id", "ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect()
    val back = AsOf.queries("join_asof")(spark, TestSpark.sf0001)
      .select("event_id", "ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect()
    val nearById = near.map(t => t._1 -> t).toMap
    back.foreach { case (id, t, ct) =>
      val (_, nt, nct) = nearById(id)
      assert(nt == t, s"event $id")
      assert(math.abs(nt.getTime - nct.getTime) <= t.getTime - ct.getTime,
        s"event $id: nearest farther than backward")
    }
    assert(near.length >= back.length) // forward-only errors are covered
    assert(near.exists { case (_, t, ct) => ct.after(t) },
      "no forward match ever chosen — the second pass is vacuous")
  }

  test("all payload fields come from the same matched row (atomic struct)") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a", 1.0),
      (1L, ts("2024-01-01 09:30:00"), "b", 2.0)
    ).toDF("k", "ts", "name", "value")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "ts",
        Map("name" -> "n", "value" -> "v"))
      .select(col("_asof.n"), col("_asof.v")).as[(String, Double)]
      .collect().head
    assert(got == ("b", 2.0))
  }
}
