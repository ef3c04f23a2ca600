package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** The composed training-data prep pipeline (round 4) — the chain a real
  * corpus actually runs before tokenization, built ENTIRELY from the
  * registered operators and oracle-gated end-to-end as ONE query:
  *
  *   documents
  *     → language filter            (filter_lang semantics)
  *     → quality filter             (text_quality signals as predicates)
  *     → exact dedup, keep-first    (dedup_exact shape: digest groupBy)
  *     → near-dup drop              (dedup_near_drop: bands → candidates
  *                                   → exact-Jaccard verify → drop)
  *     → PII scrub                  (text_pii_mask: email/URL redaction;
  *                                   tokenization sees the MASKED text)
  *     → per-doc token count + predicted language (text_token_count,
  *                                   text_lang_id)
  *
  * This is the "complete engine" demonstration: every stage reuses the
  * same Scala machinery AND the same oracle SQL fragments as its
  * standalone key, so the composition is checked by the same DuckDB hash
  * gate — at sf0.01: 500 docs → 218 (lang) → 112 (quality) → 112 (no
  * exact dups in this corpus; the digest groupBy still runs) → 110
  * (near-dup drop), each stage doing observable work.
  *
  * Scale shape: the filters and per-doc features are map-only, one pass
  * per document; the only shuffles are the digest groupBy (ids+digest,
  * never payloads) and the candidate-bounded near-dup machinery
  * (see [[Dedup.nearDupSurvivors]]). Nothing in the chain is corpus².
  */
object CorpusPrep {

  /** Quality predicate shared by the Spark and SQL sides: stopword ratio,
    * distinct-word ratio, and a minimum word count — the classic cheap
    * quality gates, thresholds calibrated to keep ~half the lang-filtered
    * synthetic corpus. */
  private val minStopRatio = 0.03
  private val minUniqRatio = 0.35
  private val minWords = 25

  def prepare(docs: DataFrame, materializeBase: Boolean = true): DataFrame = {
    val w = Text.words(col("text"))
    val langF = docs.filter(col("lang") === "en")
    val quality = langF.filter(
      Text.stopwordRatio(col("text")) >= minStopRatio &&
        (size(array_distinct(w)).cast("double") / size(w)) >= minUniqRatio &&
        size(w) >= minWords)
    // exact dedup keep-first: one shuffle of (digest, min-id); the winner
    // set joins back as a semi-join so payloads never reshuffle
    val keepMin = quality
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact0 = quality.join(keepMin, Seq("doc_id"), "left_semi")
    // The near-dup machinery + feature join reference this frame from ~8
    // branches — lazily that is 24 corpus scans, each re-running the
    // filter chain (pushed lang predicate notwithstanding). Materialize
    // the (already small) filtered base once per call so every branch
    // reads the checkpoint: at 100 TB this is one corpus pass instead of
    // 24. localCheckpoint (not cache) so the lineage truncates and no
    // CacheManager substitution can leak across bench runs; the spec
    // asserts the lazy form is result-identical.
    val exact = if (materializeBase) exact0.localCheckpoint() else exact0
    // near-dup drop within the surviving subset — identical machinery
    // (and identical oracle CTEs, parameterized by source) as
    // dedup_near_drop
    val survivors = Dedup.nearDupSurvivors(
      exact.select("doc_id", "text", "n_chars"))
    // PII scrub (text_pii_mask stage): tokenization runs on the MASKED
    // text — redacted spans collapse to one <EMAIL>/<URL> token — while
    // language-ID keeps the original (stopwords are not PII). n_pii makes
    // the scrub observable per document. Same deterministic enrichment as
    // the standalone key (the synthetic corpus carries no natural PII).
    val enriched = Text.piiEnrich(col("text"), col("doc_id"))
    survivors.join(
        exact.select(col("doc_id"),
          Text.tokenCount(Text.piiMask(enriched)).cast("long").as("n_tokens"),
          (regexp_count(enriched, lit(Text.emailRe)) +
            regexp_count(enriched, lit(Text.urlRe))).cast("long").as("n_pii"),
          Text.langIdExpr(col("text")).as("lang_pred")),
        Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** The composed CURATION pipeline (round 6) — what runs AFTER prep to
    * turn a cleaned corpus into a training cut, built entirely from the
    * round-6 registered operators and gated end-to-end as one query:
    *
    *   documents
    *     → language-mix equalize     (sample_mix_equalize semantics)
    *     → token-budget pack         (sample_budget_pack: greedy prefix,
    *                                  longest-first, Σtokens ≤ budget)
    *     → vocab-id tokenization     (tokenize_vocab_ids over the packed
    *                                  set — the vocab is the CUT's vocab)
    *
    * Stage arithmetic at sf0.01 (measured, matches README): 500 docs
    * → 310 (mix) → 95 (pack at 8k tokens) → same 95 rows tokenized.
    * Scale shape: the mix stage is a map-side accept against a broadcast
    * rate table; the pack is the two-level distributed prefix sum;
    * tokenization shuffles (doc, word) keys with map-side partials.
    * Nothing corpus².
    */
  def trainingMix(docs: DataFrame, budget: Long = 8000L,
      buckets: Int = 8): DataFrame = {
    // rate table + accept predicate come from Sampling — the SAME
    // definitions the standalone sample_mix_equalize key runs, so the
    // composed pipeline cannot drift from the operator its oracle mirrors.
    //
    // Stage boundaries MATERIALIZE (localCheckpoint): budgetPack's
    // quantile pass and the tokenizer's range-id pass are eager actions,
    // and without a cut each one would re-execute the whole upstream
    // chain (measured 2.6× on the sf0.1 bench). At cluster scale this
    // is the persisted stage boundary any multi-pass pipeline writes;
    // locally the truncated lineage serves the same role.
    val mixed = docs.join(Sampling.mixRates(docs), "lang")
      .filter(Sampling.mixAccept)
      .select("doc_id", "text", "n_chars")
      .localCheckpoint()
    val packed = Sampling.budgetPack(mixed, budget, buckets)
      .select("doc_id", "cum_tokens")
      .localCheckpoint()
    val packDocs = mixed.join(packed, Seq("doc_id"))
    TermStats.tokenizeVocabIds(packDocs)
      .withColumnRenamed("n_tokens", "n_words")
      .join(packed, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("cum_tokens"), col("ids"))
      .orderBy("doc_id")
  }

  /** The composed SEMANTIC curation pipeline (round 7) — the
    * embedding-era chain, built entirely from this round's registered
    * operators and gated end-to-end as one query:
    *
    *   documents + embeddings
    *     → HTML boilerplate strip   (text_html_strip: tags out, entities
    *                                 decoded; batching sees CLEAN tokens)
    *     → semantic cluster prune   (dedup_embedding_prune: cosine
    *                                 components capped at 2 members,
    *                                 joined on doc_id = vec_id)
    *     → length-bucket batches    (sample_length_batches over the
    *                                 survivors' cleaned text)
    *
    * Scale shape: the strip is map-only; the prune is the
    * candidate-bounded CC loop (edges from the blocked cartesian —
    * LSH/IVF-routable at corpus scale); the batch ranks are the
    * two-level machinery. Stage boundaries localCheckpoint for the same
    * reason as [[trainingMix]] (the CC labels are referenced by both
    * the batch pass and the final join; without the cut the loop would
    * re-run per reference). */
  def semanticPrep(docs: DataFrame, emb: DataFrame,
      clusters: Option[DataFrame] = None): DataFrame = {
    val enriched = Text.htmlEnrich(col("text"), col("doc_id"))
    val cleaned = docs.select(col("doc_id"),
      Text.htmlStrip(enriched).as("text"),
      regexp_count(enriched, lit(Text.tagRe)).cast("long").as("n_tags"))
    val kept = Similarity.embeddingClusterPruneFrom(
        clusters.getOrElse(Similarity.embeddingClusters(emb)))
      .withColumnRenamed("vec_id", "doc_id")
    val keptDocs = cleaned.join(kept, Seq("doc_id")).localCheckpoint()
    Sampling.lengthBucketBatches(keptDocs)
      .join(keptDocs.select("doc_id", "cluster", "n_tags"), Seq("doc_id"))
      .select(col("doc_id"), col("cluster"), col("n_tags"),
        col("n_tokens"), col("bin"), col("batch_id"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_corpus_prep" -> ((s, d) => prepare(Tables.documents(s, d))),
    "pipeline_training_mix" -> ((s, d) => trainingMix(Tables.documents(s, d))),
    "pipeline_semantic_prep" -> ((s, d) =>
      semanticPrep(Tables.documents(s, d), Tables.embeddings(s, d),
        clusters = Some(Similarity.clusterLabels(s, d))))
  )

  def oracle: Map[String, String] = Map(
    // Mirrors semanticPrep stage for stage from the SHARED fragments:
    // Similarity.sqlClusterLabsCtes (cluster+prune), Text.sqlHtmlStrip /
    // sqlHtmlEnrich (strip), Sampling.sqlBinExpr + tokRe (batches).
    "pipeline_semantic_prep" ->
      s"""WITH RECURSIVE ${Similarity.sqlClusterLabsCtes()},
         |ranked AS (
         |  SELECT vec_id, cluster,
         |         row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rk
         |  FROM labs),
         |kept AS (SELECT vec_id, cluster FROM ranked WHERE rk <= 2),
         |enr AS (
         |  SELECT doc_id, ${Text.sqlHtmlEnrich} AS etext FROM documents),
         |clean AS (
         |  SELECT doc_id, ${Text.sqlHtmlStrip("etext")} AS text,
         |         CAST(len(regexp_extract_all(etext, '${Text.tagRe}'))
         |           AS BIGINT) AS n_tags
         |  FROM enr),
         |kd AS (
         |  SELECT c.doc_id, c.text, c.n_tags, k.cluster
         |  FROM clean c JOIN kept k ON k.vec_id = c.doc_id),
         |t AS (
         |  SELECT doc_id, cluster, n_tags,
         |         CAST(len(regexp_extract_all(text, '${Sampling.tokRe}'))
         |           AS BIGINT) AS n_tokens
         |  FROM kd),
         |b AS (SELECT *, CAST(${Sampling.sqlBinExpr("n_tokens")} AS BIGINT)
         |        AS bin FROM t),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY bin ORDER BY doc_id) AS rk2 FROM b)
         |SELECT doc_id, cluster, n_tags, n_tokens, bin,
         |       CAST((rk2 - 1) // 16 AS BIGINT) AS batch_id
         |FROM r ORDER BY doc_id""".stripMargin,
    // Mirrors prepare() stage for stage; the near-dup CTEs are the SAME
    // chain as the dedup_near_drop oracle, re-sourced at `base`.
    "pipeline_corpus_prep" ->
      s"""WITH langf AS (
         |  SELECT doc_id, text, n_chars FROM documents WHERE lang = 'en'),
         |qf AS (
         |  SELECT * FROM langf WHERE
         |    CAST(len(list_filter(string_split(text, ' '),
         |         w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
         |      / len(string_split(text, ' ')) >= $minStopRatio
         |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) >= $minUniqRatio
         |    AND len(string_split(text, ' ')) >= $minWords),
         |keepmin AS (
         |  SELECT min(doc_id) AS doc_id FROM qf GROUP BY md5(text)),
         |base AS (SELECT qf.* FROM qf JOIN keepmin USING (doc_id)),
         |${Dedup.sqlJacCtes("base")},
         |dropped AS (SELECT DISTINCT b_id FROM jac WHERE jac >= 0.5)
         |SELECT b.doc_id, b.n_chars,
         |  CAST(len(regexp_extract_all(
         |    regexp_replace(regexp_replace(${Text.sqlPiiEnrich},
         |      '${Text.urlRe}', '<URL>', 'g'), '${Text.emailRe}', '<EMAIL>', 'g'),
         |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(${Text.sqlPiiEnrich}, '${Text.emailRe}'))
         |       + len(regexp_extract_all(${Text.sqlPiiEnrich}, '${Text.urlRe}'))
         |       AS BIGINT) AS n_pii,
         |  ${Text.sqlLangPredCase.linesIterator.mkString(" ")} AS lang_pred
         |FROM base b
         |WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.b_id = b.doc_id)
         |ORDER BY b.doc_id""".stripMargin,
    // Mirrors trainingMix stage for stage: the mix accept is the same
    // 60-bit uniform as sample_mix_equalize, the pack is the same global
    // window the sample_budget_pack oracle runs, tokenization is the
    // tokenize_vocab_ids chain re-sourced at the packed subset.
    "pipeline_training_mix" ->
      s"""WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
         |m AS (SELECT min(n_lang) AS mn FROM c),
         |mixed AS (
         |  SELECT d.doc_id, d.text, d.n_chars
         |  FROM documents d JOIN c USING (lang) CROSS JOIN m
         |  WHERE ${Sampling.sqlU60("mix1:")} < CAST(m.mn AS DOUBLE) / c.n_lang),
         |packed AS (
         |  SELECT doc_id, cum_tokens FROM (
         |    SELECT doc_id,
         |      CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))
         |        OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_tokens
         |    FROM mixed)
         |  WHERE cum_tokens <= 8000),
         |psrc AS (
         |  SELECT x.doc_id, x.text FROM packed p JOIN mixed x USING (doc_id)),
         |ptoks AS (
         |  SELECT doc_id, pos, word FROM (
         |    SELECT doc_id, words[i] AS word, i AS pos FROM (
         |      SELECT doc_id, string_split(text, ' ') AS words,
         |             unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
         |      FROM psrc))
         |  WHERE length(word) > 0),
         |vocab AS (
         |  SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS id
         |  FROM (SELECT DISTINCT word FROM ptoks)),
         |g AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |         string_agg(CAST(v.id AS VARCHAR), ' ' ORDER BY t.pos) AS ids
         |  FROM ptoks t JOIN vocab v USING (word) GROUP BY t.doc_id)
         |SELECT g.doc_id, g.n_words, p.cum_tokens, g.ids
         |FROM g JOIN packed p USING (doc_id)
         |ORDER BY g.doc_id""".stripMargin
  )
}
