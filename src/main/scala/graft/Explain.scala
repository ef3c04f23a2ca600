package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries so
  * scan pruning / pushdown / join strategy / codegen spans can be checked
  * (`runMain graft.Explain [query ...]` — no args = a curated set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("agg_group_by", "join_broadcast_dim", "join_equi_hash",
        "limit_topk", "filter_pending", "sim_topk", "project_entry",
        "join_salted_skew", "join_bucketed_colocated", "sim_near_dup",
        // dedup_cluster is deliberately absent: its builder runs the
        // iterative fixpoint eagerly, so the printed plan would only show
        // the final cached scan — nothing to audit.
        "segment_file_bytes", "dedup_near_drop", "sim_ann_ivf_seeded",
        "dedup_embedding", "source_csv", "stream_sliding",
        "dedup_simhash_pairs", "dedup_embedding_lsh",
        "stream_watermark_late")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
