package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{CorpusPrep, Dedup, Text}
import graft.model.Tables

class CorpusPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("composed prep pipeline: every stage shrinks (or holds) the corpus, " +
      "output is a subset of the lang-filtered input, near-dups are gone") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = CorpusPrep.prepare(docs)
    val outIds = out.select("doc_id").as[Long].collect().toSet
    val langIds = docs.filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    assert(outIds.nonEmpty && outIds.subsetOf(langIds))
    assert(outIds.size < langIds.size, "quality/near-dup stages dropped nothing")
    // schema contract: the columns downstream tokenization needs
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_chars", "n_tokens", "n_pii", "lang_pred"))
    // token counts are positive for surviving (>= minWords) docs
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    // the PII scrub stage does observable work: planted PII on every
    // third doc_id ⇒ n_pii = 2 there (one email + one URL), 0 elsewhere
    assert(out.filter(col("doc_id") % 3 === 0 && col("n_pii") =!= 2).count() == 0)
    assert(out.filter(col("doc_id") % 3 =!= 0 && col("n_pii") =!= 0).count() == 0)
    assert(out.filter(col("n_pii") === 2).count() > 0, "no PII-carrying survivor")
  }

  test("composed training-mix pipeline: output is a packed subset of the " +
      "mixed cut, budget holds, ids decode against the cut's vocab") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = CorpusPrep.trainingMix(docs)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // budget holds on every packed row
    assert(rows.forall(_.getAs[Long]("cum_tokens") <= 8000L))
    // the pipeline thins: packed ⊂ corpus, and the mix stage dropped rows
    assert(rows.length < docs.count())
    // stage consistency: every output doc passes the mix-accept predicate
    val mixedIds = graft.ops.Sampling
      .queries("sample_mix_equalize")(spark, TestSpark.sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).forall(mixedIds))
    // the id sequences decode: n_words equals the id count per doc
    rows.foreach { r =>
      assert(r.getString(3).split(" ").length.toLong == r.getAs[Long]("n_words"))
    }
  }

  test("composed semantic-prep pipeline: output ids are exactly the " +
      "cluster-prune survivors, tag counts surface on every enriched " +
      "doc, and batch ids respect the per-bin contract") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val out = CorpusPrep.semanticPrep(docs, emb)
      .select("doc_id", "cluster", "n_tags", "bin", "batch_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val kept = graft.ops.Similarity.embeddingClusterPrune(emb)
      .select("vec_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == kept)
    out.foreach { case (id, _, nTags, _, _) =>
      assert((nTags > 0) == (id % 4 == 0), s"doc $id n_tags=$nTags") }
    out.groupBy(t => (t._4, t._5)).foreach { case ((bin, b), rows) =>
      assert(rows.length <= 16, s"bin $bin batch $b overfull") }
  }

  test("a planted near-duplicate inside the quality-passing subset is dropped " +
      "by the final stage, not by the filters") {
    // two near-dup docs engineered to pass lang+quality gates
    val base = "the data of a scan and the table to hash in the merge " +
      "with more words appended here so the document passes the minimum " +
      "word count gate easily one two three four five six seven eight"
    val nearDup = base.replace("merge", "join")
    val docs = Seq(
      (1L, base, "en"), (2L, nearDup, "en"),
      (3L, "short text", "en"),
      (4L, base, "zh")
    ).toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = CorpusPrep.prepare(docs).select("doc_id").as[Long].collect().toSet
    // 1 survives; 2 dropped as near-dup of 1; 3 fails quality (word count);
    // 4 fails the language filter despite identical text
    assert(out == Set(1L), s"out=$out")
  }

  test("materialized base is result-identical to the fully-lazy form and " +
      "collapses the plan's corpus scans to one") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val eager = CorpusPrep.prepare(docs)
    val lazyF = CorpusPrep.prepare(docs, materializeBase = false)
    assert(eager.collect().toSeq == lazyF.collect().toSeq)
    // every branch downstream of the checkpoint reads the materialized
    // RDD; only the residual feature join may still touch parquet
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(scans(eager) == 0, s"eager plan still scans parquet ${scans(eager)}x")
    assert(scans(lazyF) > 10)
  }
}
