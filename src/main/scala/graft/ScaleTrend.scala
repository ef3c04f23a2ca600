package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-trend evidence runner (VERDICT r2 #4, extended r4 per VERDICT r3
  * #3).
  *
  * The driver's testdata tops out at sf0.1, so the scale argument is made
  * as a TREND: run the candidate-routed pipelines at every available SF
  * and record (a) wall time and (b) the candidate-pair counts vs the
  * quadratic all-pairs alternative. Near-linear growth in candidates and
  * time — against 100× growth in the quadratic baseline — is the evidence
  * that the routing, not the small data, is what bounds the work.
  *
  * Round 4: pass `synth` as an argument (or set SPARK_GRAFT_SYNTH=1) to
  * extend the trend ONE DECADE past sf0.1 — [[SynthCorpus]] generates a
  * seed-derived ~10× documents+embeddings corpus (real-vocabulary word
  * templates, planted near-dups, same weak-similarity embedding regime)
  * in a temp dir, and the same counters run against it as a fourth row.
  *
  * Emits one JSON line per SF dir (stdout), stderr progress.
  */
object ScaleTrend {
  def main(args: Array[String]): Unit = {
    val baseSfs = args.filterNot(_ == "synth") match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    }
    val wantSynth = args.contains("synth") ||
      sys.env.get("SPARK_GRAFT_SYNTH").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val synthDir: Option[String] = if (wantSynth) {
      val out = java.nio.file.Files.createTempDirectory("graft-synth").toString
      System.err.println(s"[scale] generating 10x synth corpus in $out")
      Some(SynthCorpus.generate(spark, "/root/testdata/sf0.1", out))
    } else None
    val sfs = baseSfs ++ synthDir

    // steady-state timing: min of 3 full materializations
    def time(df: => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    for (sf <- sfs) {
      val docs = graft.model.Tables.documents(spark, sf)
      val emb = graft.model.Tables.embeddings(spark, sf)
      val nDocs = docs.count()
      val nEmb = emb.count()
      val nQ = emb.filter(col("vec_id") < 10).count()

      val dedupCands = graft.ops.Dedup.nearDupCandidates(docs).count()
      val allPairs = nDocs * (nDocs - 1) / 2
      val lshCands = graft.ops.Similarity
        .lshCandidates(emb, col("vec_id") < 10).count()
      val bruteCands = nQ * (nEmb - 1)
      // whole-corpus embedding-dedup LSH routing (dedup_embedding_lsh):
      // candidate pairs vs the n·(n-1)/2 the exact blocked-cartesian touches
      val embDedupCands = graft.ops.Similarity.lshDedupCandidates(emb).count()
      val embAllPairs = nEmb * (nEmb - 1) / 2
      // IVF-routed embedding dedup (dedup_embedding_ivf): candidate mass
      // Σ|list|² at the registered fixed default nlist=16 vs nlist=128 —
      // the production rule is nlist ∝ √n (Similarity.ivfDedupCandidates
      // doc); the pair quantifies what the fixed dial costs at 10× and
      // what growing it buys. memberships=2 for both (the gated default).
      def ivfCands(nlist: Int): Long = graft.ops.Similarity
        .ivfDedupCandidates(emb,
          graft.ops.Similarity.ivfCentroids(emb, nlist, 0), 2).count()
      val ivfCands16 = ivfCands(16)
      val ivfCands128 = ivfCands(128)
      // SimHash block-routing: candidate pairs sharing >= 1 bit block
      // (the pre-verify join size) vs all-pairs — both geometries, showing
      // what widening blocks buys on a template-heavy corpus.
      val fp = graft.ops.Dedup.simhashReplicable(docs)
      val shCands = graft.ops.Dedup.simhashBlockCandidates(fp, 3, 30)
        .select("a_id", "b_id").distinct().count()
      val shCandsWide = graft.ops.Dedup.simhashBlockCandidates(fp, 2, 30)
        .select("a_id", "b_id").distinct().count()
      val nClusters = graft.ops.Dedup.nearDupClusters(docs)
        .select("cluster").distinct().count()
      val ccRounds = graft.ops.Dedup.lastClusterRounds.get

      val tNearDrop = time(graft.ops.Dedup.queries("dedup_near_drop")(spark, sf))
      val tLsh = time(graft.ops.Similarity.queries("sim_ann_lsh")(spark, sf))
      val tEmbLsh = time(
        graft.ops.Similarity.queries("dedup_embedding_lsh")(spark, sf))
      val tEmbIvf16 = time(graft.ops.Similarity.embeddingDedupIvfSurvivors(
        emb, 0.35, graft.ops.Similarity.ivfCentroids(emb, 16, 0), 2))
      val tEmbIvf128 = time(graft.ops.Similarity.embeddingDedupIvfSurvivors(
        emb, 0.35, graft.ops.Similarity.ivfCentroids(emb, 128, 0), 2))
      val tIvfSeeded = time(
        graft.ops.Similarity.queries("sim_ann_ivf_seeded")(spark, sf))
      // the synth decade dir carries only documents+embeddings
      val hasEvents = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$sf/events.parquet"))
      val tSession = if (hasEvents)
        time(graft.ops.EventWindows.queries("stream_session")(spark, sf))
      else -1.0
      val tExact = time(graft.ops.Dedup.queries("dedup_exact")(spark, sf))
      val tSimhashPairs = time(graft.ops.Dedup.queries("dedup_simhash_pairs")(spark, sf))
      val tSimhashWide = time(
        graft.ops.Dedup.queries("dedup_simhash_pairs_wide")(spark, sf))
      val tCorpusPrep = time(
        graft.ops.CorpusPrep.queries("pipeline_corpus_prep")(spark, sf))
      // round 6: token-budget pack — the two-level distributed prefix
      // sum vs the single-global-window composed form (the one-partition
      // sort). Budget fixed (12k): the prefix sum runs over ALL rows
      // before the filter, so cost tracks n, not the budget.
      val tBudgetPack = time(
        graft.ops.Sampling.queries("sample_budget_pack")(spark, sf))
      val tBudgetGlobal = time(
        graft.ops.Sampling.budgetPackGlobal(docs, 12000L))
      // round 6: term-statistics shuffles (explode → keyed aggs → join)
      val tTfidf = time(
        graft.ops.TermStats.queries("text_tfidf_top")(spark, sf))
      val tUnigram = time(
        graft.ops.TermStats.queries("text_unigram_logprob")(spark, sf))
      val tSampleHash = time(
        graft.ops.Sampling.queries("sample_hash")(spark, sf))
      val tIntervalJoin = if (hasEvents)
        time(graft.ops.EventWindows.queries("stream_interval_join")(spark, sf))
      else -1.0
      // round 7: incremental dedup — cross-set banded candidate mass vs
      // the n_new × n_exist pairs a full re-join would touch, plus wall
      // time (the claim at Dedup.incrementalSurvivors is that the
      // increment PROBES the corpus, so candidates must grow far slower
      // than the cross product).
      val nNew = docs.filter(pmod(col("doc_id"), lit(5)) === 0).count()
      val incCands = graft.ops.Dedup.incrementalCandidates(docs).count()
      val incCrossPairs = nNew * (nDocs - nNew)
      val tIncremental = time(
        graft.ops.Dedup.queries("dedup_incremental")(spark, sf))
      // round 7: exact multimodal dedup — digest groupBy, the linear
      // baseline every asset corpus runs first.
      val tMmDedup = time(
        graft.ops.Multimodal.queries("multimodal_dedup_exact")(spark, sf))
      // round 7: substring-span dedup — window-hash candidate mass vs the
      // n_windows² a naive all-pairs window compare would touch.
      val nWindows = docs
        .agg(sum(greatest(col("n_chars") - 39, lit(0L)))).head().getLong(0)
      val spanCands = graft.ops.Dedup.substringWindowCandidates(docs).count()
      val tSpans = time(
        graft.ops.Dedup.queries("dedup_substring_spans")(spark, sf))
      // round 7 session 2: paragraph-level dedup — occurrence volume vs
      // distinct paragraphs is the hot-key spectrum the algebraic
      // min-struct groupBy absorbs map-side; wall time should track the
      // occurrence count (one agg + one skew-free semi-join + rebuild).
      val paras = graft.ops.Dedup.paragraphize(docs)
      val nParas = paras.count()
      val nDistinctParas = paras.select("para").distinct().count()
      val tParagraph = time(
        graft.ops.Dedup.queries("dedup_paragraph")(spark, sf))
      // containment rides the SAME banded candidates as dedup_near_drop
      // (dedup_cand_pairs above) — only the verify arithmetic differs.
      val tContainment = time(
        graft.ops.Dedup.queries("dedup_containment")(spark, sf))
      // URL canonicalization: map-side normalize + one algebraic groupBy.
      val tUrlCanonical = time(
        graft.ops.Dedup.queries("dedup_url_canonical")(spark, sf))
      // A-ES weighted top-k: map-side keys + TakeOrderedAndProject.
      val tWeighted = time(
        graft.ops.Sampling.queries("sample_weighted")(spark, sf))
      // trending top-k: the pre-agg path vs the single-agg stream form —
      // the Expand-over-histogram-vs-Expand-over-stream gap.
      val (tTrendPre, tTrendSingle) = if (hasEvents) {
        val ev = graft.model.Tables.events(spark, sf)
        (time(graft.ops.EventWindows.trendingCountsPreAgg(ev)),
         time(graft.ops.EventWindows.trendingCounts(ev)))
      } else (-1.0, -1.0)

      // round 7 session 3: SQ8 route+rerank vs the float32 brute force
      // it approximates; component clustering over the cosine graph
      // (rounds + edge mass are the scale dials); length-bucket batch
      // assignment (two-level rank machinery under a per-bin contract).
      val tSq8 = time(graft.ops.Similarity.quantizedRerankTopK(
        emb, col("vec_id") < 10))
      val tBrute = time(graft.ops.Similarity.bruteForceTopK(
        emb, col("vec_id") < 10, 5))
      val embClusterEdges = graft.ops.Similarity
        .embeddingThresholdPairs(emb, 0.35, 8).count()
      val tEmbCluster = time(graft.ops.Similarity.embeddingClusters(emb))
      val embCcRounds = graft.ops.Dedup.lastClusterRounds.get()
      val tLenBatches = time(graft.ops.Sampling.lengthBucketBatches(docs))

      // round 7 session 4: iterative graph ops — fixed-point PageRank
      // wall time across the decade (10 synchronous join+agg rounds),
      // and the triangle-orientation evidence: wedge count (the exact
      // enumeration-join volume) under degree ordering vs id ordering
      // on the hub-skewed crawl graph.
      // round 7 session 5: frontier BFS (the scatter-volume claim is
      // structural — each node enters the frontier once, so total
      // scatter ≤ 2|E| against rounds×2|E| for dense min-propagation;
      // rounds here = 6, the seed set's diameter) and PQ ANN — ADC
      // wall time plus MEASURED
      // recall@5 vs brute force at every scale (the dial the 64×
      // code-table compression is traded against).
      val tBfs = time(graft.ops.Graphs.queries("graph_bfs_depth")(spark, sf))
      val nGraphEdges = graft.ops.Graphs.crawlEdges(docs).count()
      val pqSeeds = graft.ops.Similarity.ivfCentroids(emb, 16, 0)
      val tPq = time(graft.ops.Similarity.pqTopK(
        emb, pqSeeds, col("vec_id") < 10, 5))
      val bruteSet = graft.ops.Similarity.bruteForceTopK(
        emb, col("vec_id") < 10, 5).select("q_id", "n_id")
      val pqSet = graft.ops.Similarity.pqTopK(
        emb, pqSeeds, col("vec_id") < 10, 5).select("q_id", "n_id")
      val nBrute = bruteSet.count()
      val pqHits = bruteSet.intersect(pqSet).count()

      val tPagerank = time(graft.ops.Graphs.queries("graph_pagerank")(spark, sf))
      val tHits = time(graft.ops.Graphs.queries("graph_hits")(spark, sf))
      val tTriangles = time(graft.ops.Graphs.queries("graph_triangles")(spark, sf))
      val wedgesDeg = graft.ops.Graphs.wedgeCount(docs, byDegree = true)
      val wedgesId = graft.ops.Graphs.wedgeCount(docs, byDegree = false)

      // round 8 session 6: the r8 operators' routing evidence.
      // (a) interval-overlap join — BIN-ROUTED candidate pairs (the
      //     equi-join volume BEFORE the exact verify) vs the naive
      //     theta volume n_sessions²; the claim is the same one every
      //     routed dedup makes: candidates, not the cross product,
      //     bound the work.
      // (b) IVFPQ — the composed route's ADC scan rows (Σ per-query
      //     probed-list sizes) vs full-scan PQ's q·(n−1), plus
      //     recall@5 vs brute force: the scan-budget/recall trade at
      //     every scale.
      // (c) sequence packing — wall time (the two-level prefix sum's
      //     near-linearity is the claim; candidates don't apply).
      val ev = graft.model.Tables.events(spark, sf)
      val seCnt = ev.groupBy(session_window(col("ts"), "30 minutes"),
        col("user_id")).count().count()
      val seF = ev.groupBy(session_window(col("ts"), "30 minutes"),
          col("user_id"))
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"), col("t0"), col("t1"))
      val h0 = floor(unix_timestamp(col("t0")) / 3600).cast("long")
      val h1 = floor(unix_timestamp(col("t1")) / 3600).cast("long")
      val binnedSe = seF.select(col("user_id"), col("t0"), col("t1"),
        explode(sequence(h0, h1)).as("bin"))
      val ivA = binnedSe.select(col("bin"), col("user_id").as("ua"),
        col("t0").as("a0"), col("t1").as("a1"))
      val ivB = binnedSe.select(col("bin"), col("user_id").as("ub"),
        col("t0").as("b0"), col("t1").as("b1"))
      val ivCands = ivA.join(ivB, Seq("bin"))
        .filter(col("ua") < col("ub"))
        .select("ua", "ub", "a0", "b0").distinct().count()
      val ivNaive = seCnt * (seCnt - 1) / 2
      val tIntervalOverlap =
        time(graft.ops.Scale.queries("join_interval_overlap")(spark, sf))

      val ivfpqRoute = graft.ops.Similarity.ivfProbe(
        emb, pqSeeds, col("vec_id") < 10, Int.MaxValue, 4).count()
      val pqFullScan = 10L * (nEmb - 1)
      val ivfpqSet = graft.ops.Similarity.ivfPqTopK(
        emb, pqSeeds, col("vec_id") < 10, 5).select("q_id", "n_id")
      val ivfpqHits = bruteSet.intersect(ivfpqSet).count()
      val tIvfPq = time(graft.ops.Similarity.ivfPqTopK(
        emb, pqSeeds, col("vec_id") < 10, 5))

      val tPackSeq =
        time(graft.ops.Sampling.queries("sample_pack_sequences")(spark, sf))

      System.err.println(s"[scale] $sf docs=$nDocs done")
      println(s"""{"sf":"$sf","n_docs":$nDocs,"n_emb":$nEmb,""" +
        s""""dedup_cand_pairs":$dedupCands,"dedup_all_pairs":$allPairs,""" +
        s""""lsh_cand_pairs":$lshCands,"brute_cand_pairs":$bruteCands,""" +
        s""""emb_dedup_cand_pairs":$embDedupCands,"emb_all_pairs":$embAllPairs,""" +
        s""""emb_ivf_cand_pairs_16":$ivfCands16,""" +
        s""""emb_ivf_cand_pairs_128":$ivfCands128,""" +
        s""""t_dedup_embedding_ivf_16":${r3(tEmbIvf16)},""" +
        s""""t_dedup_embedding_ivf_128":${r3(tEmbIvf128)},""" +
        s""""simhash_block_cand_pairs":$shCands,""" +
        s""""simhash_block_cand_pairs_wide":$shCandsWide,""" +
        s""""n_clusters":$nClusters,"cc_rounds":$ccRounds,""" +
        s""""t_dedup_near_drop":${r3(tNearDrop)},"t_sim_ann_lsh":${r3(tLsh)},""" +
        s""""t_dedup_embedding_lsh":${r3(tEmbLsh)},""" +
        s""""t_sim_ann_ivf_seeded":${r3(tIvfSeeded)},""" +
        s""""t_stream_session":${r3(tSession)},"t_dedup_exact":${r3(tExact)},""" +
        s""""t_dedup_simhash_pairs":${r3(tSimhashPairs)},""" +
        s""""t_dedup_simhash_pairs_wide":${r3(tSimhashWide)},""" +
        s""""t_pipeline_corpus_prep":${r3(tCorpusPrep)},""" +
        s""""t_sample_budget_pack":${r3(tBudgetPack)},""" +
        s""""t_budget_pack_global":${r3(tBudgetGlobal)},""" +
        s""""t_text_tfidf_top":${r3(tTfidf)},""" +
        s""""t_text_unigram_logprob":${r3(tUnigram)},""" +
        s""""t_sample_hash":${r3(tSampleHash)},""" +
        s""""t_stream_interval_join":${r3(tIntervalJoin)},""" +
        s""""n_new_docs":$nNew,"inc_cand_pairs":$incCands,""" +
        s""""inc_cross_pairs":$incCrossPairs,""" +
        s""""t_dedup_incremental":${r3(tIncremental)},""" +
        s""""t_multimodal_dedup_exact":${r3(tMmDedup)},""" +
        s""""n_span_windows":$nWindows,"span_cand_pairs":$spanCands,""" +
        s""""t_dedup_substring_spans":${r3(tSpans)},""" +
        s""""n_para_occurrences":$nParas,"n_distinct_paras":$nDistinctParas,""" +
        s""""t_dedup_paragraph":${r3(tParagraph)},""" +
        s""""t_dedup_containment":${r3(tContainment)},""" +
        s""""t_dedup_url_canonical":${r3(tUrlCanonical)},""" +
        s""""t_sample_weighted":${r3(tWeighted)},""" +
        s""""t_trending_preagg":${r3(tTrendPre)},""" +
        s""""t_trending_single":${r3(tTrendSingle)},""" +
        s""""t_sim_ann_quantized":${r3(tSq8)},""" +
        s""""t_sim_brute":${r3(tBrute)},""" +
        s""""emb_cluster_edges":$embClusterEdges,""" +
        s""""emb_cluster_rounds":$embCcRounds,""" +
        s""""t_emb_cluster":${r3(tEmbCluster)},""" +
        s""""t_length_batches":${r3(tLenBatches)},""" +
        s""""t_graph_pagerank":${r3(tPagerank)},""" +
        s""""t_graph_hits":${r3(tHits)},""" +
        s""""t_graph_triangles":${r3(tTriangles)},""" +
        s""""graph_wedges_degree_oriented":$wedgesDeg,""" +
        s""""graph_wedges_id_oriented":$wedgesId,""" +
        s""""t_graph_bfs":${r3(tBfs)},"n_graph_edges":$nGraphEdges,""" +
        s""""t_sim_ann_pq":${r3(tPq)},""" +
        s""""pq_recall_at5":${math.rint(pqHits.toDouble / nBrute * 1000) / 1000},""" +
        s""""n_sessions":$seCnt,"iv_cand_pairs":$ivCands,""" +
        s""""iv_naive_pairs":$ivNaive,""" +
        s""""t_join_interval_overlap":${r3(tIntervalOverlap)},""" +
        s""""ivfpq_route_rows":$ivfpqRoute,"pq_full_scan_rows":$pqFullScan,""" +
        s""""ivfpq_recall_at5":${math.rint(ivfpqHits.toDouble / nBrute * 1000) / 1000},""" +
        s""""t_sim_ann_ivfpq":${r3(tIvfPq)},""" +
        s""""t_sample_pack_sequences":${r3(tPackSeq)}}""")
    }
    spark.stop()
    synthDir.foreach(graft.ops.SessionCleanup.deleteRecursively)
  }
}
