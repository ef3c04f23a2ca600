package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-trend evidence runner (VERDICT r2 "Next round" #4).
  *
  * No SF above 0.1 exists in this sandbox, so the scale argument is made
  * as a TREND: run the candidate-routed pipelines at every available SF
  * and record (a) wall time and (b) the candidate-pair counts vs the
  * quadratic all-pairs alternative. Near-linear growth in candidates and
  * time — against 100× growth in the quadratic baseline — is the evidence
  * that the routing, not the small data, is what bounds the work.
  *
  * Emits one JSON line per SF dir (stdout), stderr progress.
  */
object ScaleTrend {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
      // SimHash block-routing: candidate pairs sharing >= 1 bit block
      // (the pre-verify join size) vs all-pairs — same construction the
      // operator runs (Dedup.simhashBlockCandidates).
      val shCands = graft.ops.Dedup
        .simhashBlockCandidates(graft.ops.Dedup.simhashReplicable(docs), 3, 30)
        .select("a_id", "b_id").distinct().count()
      val nClusters = graft.ops.Dedup.nearDupClusters(docs)
        .select("cluster").distinct().count()

      val tNearDrop = time(graft.ops.Dedup.queries("dedup_near_drop")(spark, sf))
      val tLsh = time(graft.ops.Similarity.queries("sim_ann_lsh")(spark, sf))
      val tSession = time(graft.ops.EventWindows.queries("stream_session")(spark, sf))
      val tExact = time(graft.ops.Dedup.queries("dedup_exact")(spark, sf))
      val tSimhashPairs = time(graft.ops.Dedup.queries("dedup_simhash_pairs")(spark, sf))

      System.err.println(s"[scale] $sf docs=$nDocs done")
      println(s"""{"sf":"$sf","n_docs":$nDocs,"n_emb":$nEmb,""" +
        s""""dedup_cand_pairs":$dedupCands,"dedup_all_pairs":$allPairs,""" +
        s""""lsh_cand_pairs":$lshCands,"brute_cand_pairs":$bruteCands,""" +
        s""""simhash_block_cand_pairs":$shCands,"n_clusters":$nClusters,""" +
        s""""t_dedup_near_drop":${r3(tNearDrop)},"t_sim_ann_lsh":${r3(tLsh)},""" +
        s""""t_stream_session":${r3(tSession)},"t_dedup_exact":${r3(tExact)},""" +
        s""""t_dedup_simhash_pairs":${r3(tSimhashPairs)}}""")
    }
    spark.stop()
  }
}
