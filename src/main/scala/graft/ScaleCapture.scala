package graft

import org.apache.spark.sql.SparkSession

/** One-off sf1 scale capture (VERDICT r12 "Next round" #6): generate a
  * seed-derived sf1-equivalent corpus (10× sf0.1 — 50k documents / 20k
  * embeddings, [[SynthCorpus.generate]], the established decade-
  * extension generator), run the most expensive registered keys
  * isolated min-of-3 at sf0.01, sf0.1, and sf1, and classify each
  * key's growth against the corpus-size ratio — the superlinearity
  * probe the 100× ScaleTrend counters can miss because they measure
  * candidate mass, not end-to-end wall time at a full decade past the
  * driver's largest SF.
  *
  * Classification (t₁/t₀.₁ against the 10× row growth):
  *   flat        < 2×   (model-sized or setup-bound work)
  *   sublinear   < 8×
  *   linear      < 16×  (10× ± scheduler/constant overhead)
  *   superlinear ≥ 16×  (a plan that will not survive 100 TB — each
  *                       such key needs a fix or a written explanation)
  *
  * Default keys are the documents/embeddings-backed top of the r12
  * driver capture; since r15 [[SynthCorpus.generate]] also writes
  * events + the TPC-H tables at 10×, so the events/join/agg/win keys
  * are capturable too (pass them as args — SCALE_r15 §2 runs the top
  * of that family). Every key runs ONE untimed build pass first so
  * memoized model artifacts (merge tables, tokenizer dirs, centroids,
  * persisted indexes) bill to build, exactly like Bench.
  *
  * Usage: runMain graft.ScaleCapture [key ...]   (default: the list
  * below); SPARK_GRAFT_SF1_DIR reuses an already-generated corpus.
  */
object ScaleCapture {
  private val DefaultKeys = Seq(
    "pipeline_tensor_prep", "pipeline_decode_roundtrip",
    "pipeline_decode_roundtrip_eow",
    "pipeline_inference_prep", "pipeline_inference_prep_unk",
    "sample_pack_segments", "sample_pack_unk_roundtrip",
    "sample_pack_roundtrip", "sample_pack_tensor", "sample_pack_labels",
    "pipeline_training_mix", "sample_curriculum_ranked",
    "graph_bfs_depth", "graph_hits", "graph_pagerank",
    "dedup_substring_spans", "sim_ann_ivfpq")

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args.toSeq else DefaultKeys
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    // SPARK_GRAFT_SF1_DIR reuses an already-generated corpus — and
    // generates INTO it (kept, not temp-deleted) when the dir is
    // empty, so repeated diagnostic runs share one generation.
    val sf1 = sys.env.get("SPARK_GRAFT_SF1_DIR") match {
      case Some(d) =>
        // generate() is idempotent per table (r15) — a kept pre-r15
        // dir gains the new events/TPC-H tables without regenerating
        // its documents/embeddings
        System.err.println(s"[sf1] ensuring 10x corpus in $d (kept)")
        SynthCorpus.generate(spark, "/root/testdata/sf0.1", d)
        d
      case None =>
        val out = java.nio.file.Files
          .createTempDirectory("graft-sf1").toString
        System.err.println(s"[sf1] generating 10x corpus in $out")
        SynthCorpus.generate(spark, "/root/testdata/sf0.1", out)
    }
    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", sf1)

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        sf: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, sf).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for (key <- keys) {
      val fn = SparkEntry.queries(key)
      // a key whose tables the synth dir does not carry (events/TPC-H-
      // backed) reports a skip line instead of aborting the capture —
      // those keys' scale evidence is ScaleTrend's real-SF rows.
      // ONLY the missing-input failure shape is a skip (ADVICE r14
      // #3): an AnalysisException / FileNotFound from the absent
      // table. Anything else (OOM, NPE, wrong-schema) is a genuine
      // key regression at sf1 and must abort the capture loudly, not
      // be recorded as a benign skip in the scale evidence.
      def pathMsg(e: Throwable): Boolean =
        String.valueOf(e.getMessage).contains("PATH_NOT_FOUND") ||
          String.valueOf(e.getMessage).contains("Path does not exist")
      def isMissingInput(e: Throwable): Boolean = e match {
        // AnalysisException alone is NOT enough — a wrong-column bug
        // is one too; require the path-not-found shape specifically
        case a: org.apache.spark.sql.AnalysisException => pathMsg(a)
        case _: java.io.FileNotFoundException => true
        case _ if e.getCause != null && (e.getCause ne e) =>
          isMissingInput(e.getCause)
        case _ => pathMsg(e)
      }
      val probe = try { timeOne(fn, sfs.last); None }
        catch {
          case e: Throwable if isMissingInput(e) => Some(e)
          // not a missing-table shape: rethrow — a silent skip here
          // would read as "covered" in the evidence when it wasn't
        }
      if (probe.isDefined) {
        System.err.println(s"[sf1] $key SKIP: " +
          String.valueOf(probe.get.getMessage).linesIterator.next())
        println(s"""{"key":"$key","skip":"missing_input_at_sf1"}""")
      } else {
      val ts = sfs.map { sf =>
        timeOne(fn, sf) // untimed build: memoized artifacts, JIT
        (1 to 3).map(_ => timeOne(fn, sf)).min
      }
      val ratio = ts(2) / math.max(1e-9, ts(1))
      val cls =
        if (ratio < 2.0) "flat"
        else if (ratio < 8.0) "sublinear"
        else if (ratio < 16.0) "linear"
        else "superlinear"
      System.err.println(f"[sf1] $key%-30s ${ts(0)}%7.3f ${ts(1)}%7.3f " +
        f"${ts(2)}%8.3f ratio=${ratio}%6.2f $cls")
      println(s"""{"key":"$key","t_sf0_01":${r3(ts(0))},""" +
        s""""t_sf0_1":${r3(ts(1))},"t_sf1":${r3(ts(2))},""" +
        s""""ratio_sf01_to_sf1":${r3(ratio)},"class":"$cls"}""")
      }
    }
    spark.stop()
    if (!sys.env.contains("SPARK_GRAFT_SF1_DIR"))
      graft.ops.SessionCleanup.deleteRecursively(sf1)
  }
}
