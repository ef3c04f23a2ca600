package graft

import org.apache.spark.sql.SparkSession

/** One-off density experiment for the trailing-range-window pair
  * (SCALE_r15 §3): the per-event form's window input grows with the
  * EVENT count; the bucketed form's is bounded by seconds × types.
  * The sf1 corpus is too SPARSE to separate them (1M events over
  * 2.6M seconds — nearly every event is its own bucket), so this
  * bench holds the time span fixed at ONE day and scales the event
  * count instead: per-event work must track events, bucketed work
  * must approach the 432k-bucket ceiling (86,400 s × 5 types) and
  * flatten. The 100 TB regime is the dense one — billions of events
  * per day against a fixed number of seconds.
  *
  * Usage: runMain graft.DenseWindowBench [nSmall nLarge]
  * (defaults 1M / 10M; min-of-3 after an untimed build run each.)
  * Since r16 the auto-routed key runs too: at this density every type
  * must route to the blocked form, so auto's time should track the
  * blocked row plus the one |types|-row stats collect.
  */
object DenseWindowBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.length >= 2) Seq(args(0).toLong, args(1).toLong)
      else Seq(1000000L, 10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- sizes) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-dense-$n").toString
      SynthCorpus.writeEvents(spark, s"$dir/events.parquet", n,
        nUsers = 15000L, spanDays = 1)
      // the per-event form runs only at the SMALL size: Spark
      // re-evaluates min/max over the frame CONTENTS per row (no
      // sliding-window deque), so its cost is O(rows × frame size) —
      // frame size grows with density, and the measured 1M/1-day
      // point (≈122 s vs ≈9 s for the same rows at 30-day density)
      // already demonstrates the blow-up; the 10M point would be
      // ~100× it (10× rows × 10× frame) — hours spent proving a
      // curve two points already pin.
      val keys =
        if (n == sizes.head)
          Seq("win_range_trailing", "win_range_trailing_bucketed",
            "win_range_trailing_blocked", "win_range_trailing_auto")
        else Seq("win_range_trailing_bucketed",
          "win_range_trailing_blocked", "win_range_trailing_auto")
      for (key <- keys) {
        val fn = SparkEntry.queries(key)
        fn(spark, dir).queryExecution.toRdd.count() // untimed build/JIT
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"n":$n,"key":"$key","sec":${math.rint(ts.min * 1000) / 1000}}""")
      }
      graft.ops.SessionCleanup.deleteRecursively(dir)
    }
    spark.stop()
  }
}
