package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Manifest

class ManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ids are dense, unique, and deterministic across runs") {
    val m1 = Manifest.fromDocuments(spark, TestSpark.sf0001).collect()
    val m2 = Manifest.fromDocuments(spark, TestSpark.sf0001).collect()
    assert(m1.toSeq == m2.toSeq)
    val ids = m1.map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to ids.length).toSeq)
  }

  test("SCD2 history invariants: exactly one current row per id, closed " +
      "rows chain valid_to = successor's valid_from, and only changed " +
      "ids grow a second version") {
    val hist = graft.SparkEntry.queries("manifest_scd2")(
        spark, TestSpark.sf0001)
      .select("id", "uploaded", "version", "valid_from_batch",
        "valid_to_batch", "is_current")
      .as[(Long, Boolean, Long, Long, Option[Long], Boolean)]
      .collect().groupBy(_._1)
    val m = Manifest.fromDocuments(spark, TestSpark.sf0001)
      .select("id", "uploaded").as[(Long, Boolean)].collect().toMap
    assert(hist.keySet == m.keySet)
    hist.foreach { case (id, rows) =>
      assert(rows.count(_._6) == 1, s"id $id current rows")
      val changed = id % 4 == 0 && !m(id)
      assert(rows.length == (if (changed) 2 else 1), s"id $id versions")
      if (changed) {
        val Seq(r1, r2) = rows.sortBy(_._3).toSeq
        assert(!r1._6 && r1._5.contains(r2._4), s"id $id chain")
        assert(!r1._2 && r2._2, s"id $id flag transition")
      }
    }
  }

  test("markUploaded flips exactly the given ids and nothing else") {
    val m = Seq((1L, "a", false), (2L, "b", false), (3L, "c", true))
      .toDF("id", "path", "uploaded")
    val ok = Seq(2L).toDF("id")
    val got = Manifest.markUploaded(m, ok)
      .select("id", "uploaded").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, false), (2L, true), (3L, true)))
  }

  test("merge upsert: updates flip exactly the id%4 rows, inserts continue " +
      "ids, and the update path broadcasts (no full-outer shuffle)") {
    val out = SparkEntry.queries("manifest_merge_upsert")(spark, TestSpark.sf0001)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val base = Manifest.fromDocuments(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    val mx = base.keys.max
    rows.filter(_._1 <= mx).foreach { case (id, path, up) =>
      assert(path == base(id)._1)
      assert(up == (id % 4 == 0 || base(id)._2), s"id $id")
    }
    val inserted = rows.filter(_._1 > mx)
    assert(inserted.nonEmpty)
    assert(inserted.map(_._1).sorted.toSeq ==
      (mx + 1 to mx + inserted.length).toSeq) // dense continuation
    assert(inserted.forall(r => !r._3 && r._2.startsWith("newbatch/")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("FullOuter"), plan)
  }

  test("resume fixpoint: pending after marking all pending is empty") {
    val m = Manifest.fromDocuments(spark, TestSpark.sf0001)
    val pendingIds = Manifest.filterPending(m).select("id")
    val after = Manifest.markUploaded(m, pendingIds)
    assert(Manifest.filterPending(after).count() == 0)
    assert(after.count() == m.count())
  }

  test("resume property: re-run uploads exactly the previously-failed set") {
    // random-ish success schedule: ids % 3 == 0 fail on run 1
    val m = Manifest.fromDocuments(spark, TestSpark.sf0001)
    val run1Ok = Manifest.filterPending(m).filter(col("id") % 3 =!= 0).select("id")
    val after1 = Manifest.markUploaded(m, run1Ok)
    val run2Set = Manifest.filterPending(after1).select("id")
      .as[Long].collect().toSet
    val expected = Manifest.filterPending(m).filter(col("id") % 3 === 0)
      .select("id").as[Long].collect().toSet
    assert(run2Set == expected)
  }

  test("anti/semi joins partition a rescan exactly") {
    val m = Manifest.fromDocuments(spark, TestSpark.sf0001)
    val scanned = m.select("path")
    val indexed = Manifest.filterUploaded(m).select("path")
    val anti = Manifest.antiResume(scanned, indexed).count()
    val semi = Manifest.semiUploaded(scanned, indexed).count()
    assert(anti + semi == m.count())
  }
}
