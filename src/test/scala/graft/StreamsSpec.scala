package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.Streams
import graft.ops.EventWindows
import graft.model.Tables
import java.nio.file.Files

class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streaming tumbling counts equal the batch (oracle-checked) query") {
    val stream = Streams.tumblingRate(Streams.eventsStream(spark, TestSpark.sf0001))
    runToMemory(stream, "tumbling_out")
    val got = spark.table("tumbling_out")
      .select(col("w_start").cast("long"), col("n")).as[(Long, Long)]
      .collect().toMap
    val want = EventWindows.tumbling(Tables.events(spark, TestSpark.sf0001))
      .select(col("w_start").cast("long"), col("n")).as[(Long, Long)]
      .collect().toMap
    // append mode emits a window only once the watermark passes it — the
    // final 10 minutes of data never finalize under AvailableNow. Every
    // emitted window must match the batch result exactly, and everything
    // except the watermark tail must have been emitted.
    assert(got.nonEmpty)
    assert(got.forall { case (w, n) => want.get(w).contains(n) })
    val maxTs = Tables.events(spark, TestSpark.sf0001)
      .agg(max(col("ts")).cast("long")).as[Long].collect().head
    val mustHave = want.keySet.filter(_ < maxTs - 600)
    assert(mustHave.subsetOf(got.keySet))
  }

  test("streaming sliding counts equal the batch (oracle-checked) query") {
    val stream = Streams.slidingRate(Streams.eventsStream(spark, TestSpark.sf0001))
    runToMemory(stream, "sliding_out")
    val got = spark.table("sliding_out")
      .select(col("w_start").cast("long"), col("n")).as[(Long, Long)]
      .collect().toMap
    val want = EventWindows.sliding(Tables.events(spark, TestSpark.sf0001))
      .select(col("w_start").cast("long"), col("n")).as[(Long, Long)]
      .collect().toMap
    // same append-mode contract as tumbling: every emitted window matches
    // batch exactly; all but the watermark tail (10 min) plus the last
    // window width (60 s) must have been emitted.
    assert(got.nonEmpty)
    assert(got.forall { case (w, n) => want.get(w).contains(n) })
    val maxTs = Tables.events(spark, TestSpark.sf0001)
      .agg(max(col("ts")).cast("long")).as[Long].collect().head
    val mustHave = want.keySet.filter(_ < maxTs - 600 - 60)
    assert(mustHave.subsetOf(got.keySet))
  }

  test("batch pre-aggregated sliding rate equals the single-aggregation stream form") {
    val ev = graft.model.Tables.events(spark, TestSpark.sf0001)
    val single = EventWindows.sliding(ev)
      .orderBy("w_start").collect().map(_.toString).toSeq
    val preAgg = EventWindows.slidingPreAgg(ev)
      .orderBy("w_start").collect().map(_.toString).toSeq
    assert(preAgg == single)
  }

  test("dropDuplicatesWithinWatermark removes duplicate event_ids") {
    val events = Tables.events(spark, TestSpark.sf0001).limit(100)
    val dir = Files.createTempDirectory("graft-dup").toString
    events.union(events).write.parquet(s"$dir/events.parquet")
    // stream the doubled data back with the same schema convention
    val doubled = spark.readStream
      .schema(Tables.events(spark, TestSpark.sf0001).schema)
      .parquet(s"$dir/events.parquet")
    runToMemory(Streams.dedupEvents(doubled), "dedup_out")
    assert(spark.table("dedup_out").count() == 100)
  }

  test("mapGroupsWithState running user stats match batch counts") {
    runToMemory(Streams.runningUserStats(
      Streams.eventsStream(spark, TestSpark.sf0001)).toDF(), "userstats_out",
      OutputMode.Update())
    val got = spark.table("userstats_out")
      .groupBy("userId").agg(max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    val want = Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("flatMapGroupsWithState sessions agree with session_window on closed sessions") {
    runToMemory(Streams.sessionizeWithState(
      Streams.eventsStream(spark, TestSpark.sf0001)).toDF(), "fmgs_out")
    val got = spark.table("fmgs_out")
      .select(col("userId"), col("firstTs").cast("long"), col("nEvents"))
      .as[(Long, Long, Long)].collect().toSet
    val want = EventWindows.sessions(Tables.events(spark, TestSpark.sf0001))
      .select(col("user_id"), col("s_start").cast("long"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    // append-mode state emits only *closed* sessions (watermark tail stays
    // open) — every emitted session must match the batch result exactly.
    assert(got.nonEmpty)
    assert(got.subsetOf(want), (got -- want).take(3).toString)
  }

  test("RateMonitor captures processedRowsPerSecond like set_speed") {
    val mon = new Streams.RateMonitor
    spark.streams.addListener(mon)
    try {
      runToMemory(Streams.tumblingRate(
        Streams.eventsStream(spark, TestSpark.sf0001)), "rate_out")
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (mon.samples.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(mon.samples.nonEmpty)
      assert(mon.samples.forall(_ >= 0.0))
    } finally spark.streams.removeListener(mon)
  }

  test("foreachBatch micro-batch upload marks the manifest transactionally") {
    import graft.ops.Manifest
    import graft.sink.{LocalFsStore, ManifestStore, Uploader}
    val manifestRoot = Files.createTempDirectory("graft-mstream").toString
    val storeRoot = Files.createTempDirectory("graft-sstream").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString

    val m = Manifest.fromDocuments(spark, TestSpark.sf0001)
    ManifestStore.swap(m, manifestRoot)
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(concat(col("source"), lit("/doc_"), col("doc_id"), lit(".txt"))
        .as("path"), col("text"))

    val pendingStream = spark.readStream
      .schema(ManifestStore.read(spark, manifestRoot).schema)
      .parquet(ManifestStore.currentPath(manifestRoot))
      .filter(!col("uploaded"))

    Streams.runMicroBatchUpload(pendingStream, checkpoint, (batch, _) => {
      val withContent = batch.join(docs, Seq("path"))
        .select(col("id"), col("path"), col("text"))
        .as[(Long, String, String)]
        .map { case (id, p, t) => (id, p, t.getBytes("UTF-8")) }
      val results = Uploader.upload(withContent,
        () => new LocalFsStore(storeRoot), 4)
      val current = ManifestStore.read(spark, manifestRoot)
      val marked = Manifest.markUploaded(current,
        results.filter(col("ok")).toDF()).cache()
      marked.count()
      ManifestStore.swap(marked, manifestRoot)
    })

    val after = ManifestStore.read(spark, manifestRoot)
    assert(after.filter(!col("uploaded")).count() == 0)
    assert(after.count() == m.count())
  }

  test("blocked watermark-late survivors equal the single-global-window form " +
      "and actually drop late events") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    // the 30-min arrival buckets give ~1,400 blocks over the month of
    // events, exercising the two-level scan's cross-block prefix handoff
    val blocked = EventWindows.watermarkLateSurvivors(ev)
      .orderBy("w_start").as[(java.sql.Timestamp, Long)].collect().toSeq
    val global = EventWindows.watermarkLateGlobalWindow(ev)
      .orderBy("w_start").as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(blocked == global)
    val total = ev.count()
    val kept = blocked.map(_._2).sum
    assert(kept < total, s"no late events dropped (kept=$kept of $total)")
    assert(kept > 0)
  }
}
