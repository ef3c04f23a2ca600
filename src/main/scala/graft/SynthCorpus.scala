package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seed-derived synthetic corpus generator for scale-trend evidence ONE
  * DECADE past the largest driver-provided SF (VERDICT r3 #3).
  *
  * The driver's testdata is read-only and tops out at sf0.1 (5,000 docs /
  * 2,000 vectors); this generator writes a statistically comparable corpus
  * at ~10× that size into a caller-owned temp dir:
  *  - documents: word sequences drawn from the REAL sf0.1 vocabulary
  *    (collected at generation time, so the token distribution matches the
  *    template-generated originals), doc length ~ U[20,80) words, langs and
  *    sources cycled like the originals, and ~5% planted near-duplicates
  *    (a seed-regenerated copy of an earlier doc with one word mutated) so
  *    the dedup pipelines have true positives to find;
  *  - embeddings: 64-dim vectors = per-label center (scaled seeded
  *    gaussian) + unit gaussian noise — same weak within-label similarity
  *    regime as the originals (max within-label cosine ≈ 0.5).
  *
  * Everything derives from (seed, id), so generation is deterministic,
  * embarrassingly parallel (mapPartitions over a range — no driver-side
  * data), and any row can be re-derived independently — which is what lets
  * the near-dup planting regenerate its source doc without a join.
  */
object SynthCorpus {

  /** Deterministic per-id RNG — the whole corpus is a pure function of
    * (seed, id). */
  private def rngFor(seed: Long, id: Long) =
    new scala.util.Random(seed * 1000003L + id * 2654435761L)

  private def wordsFor(seed: Long, id: Long, vocab: Array[String]): Array[String] = {
    val r = rngFor(seed, id)
    val n = 20 + r.nextInt(60)
    Array.fill(n)(vocab(r.nextInt(vocab.length)))
  }

  /** ~5% of ids are near-dups of an earlier id (same generator, one word
    * swapped) — regenerated from seed, no self-join needed. */
  private def textFor(seed: Long, id: Long, vocab: Array[String]): String = {
    if (id % 20 == 7 && id >= 20) {
      val src = id - 7 - (id % 13)
      val w = wordsFor(seed, src, vocab)
      w(((id / 20) % w.length).toInt) = vocab((id % vocab.length).toInt)
      w.mkString(" ")
    } else wordsFor(seed, id, vocab).mkString(" ")
  }

  /** Wide-vocabulary corpus for trainer DEPTH evidence (TrainerBench
    * long-run mode, SCALE_r11 §3, and the r12 local-trainer specs):
    * `nWords` distinct 8-char pseudo-words — fixed-width base-26 of
    * (index, index·Knuth-hash), distinct by construction — drawn
    * `draws` times per doc, seeded-uniform. The driver corpus exhausts
    * at 89 merges (one shared template vocabulary — every distinct
    * word fully fuses); training depth needs pair DIVERSITY, which
    * this supplies deterministically with no files written. */
  def wideVocabDocs(spark: SparkSession, nWords: Int, nDocs: Long,
      draws: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def b26f(x0: Long, w: Int): String = {
      val cs = new Array[Char](w)
      var x = x0
      var k = w - 1
      while (k >= 0) { cs(k) = ('a' + (x % 26)).toChar; x /= 26; k -= 1 }
      new String(cs)
    }
    // the index half must be injective: 26⁴ covers 456,976 indexes; a
    // BIG-vocabulary run (the r13 >4M-word crossover corpus) widens it
    // to 26⁵ ≈ 11.8M — existing ≤456k callers keep the exact r11 words
    val iw = if (nWords <= 456976) 4 else 5
    require(nWords <= 11881376, s"wideVocabDocs caps at 26^5 words")
    val vocabArr = Array.tabulate(nWords)(i =>
      b26f(i, iw) + b26f((i.toLong * 2654435761L) & 0xfffffL, 4))
    val bc = spark.sparkContext.broadcast(vocabArr)
    spark.range(nDocs).as[Long].mapPartitions { it =>
      val v = bc.value
      it.map { id =>
        val r = rngFor(seed, id)
        (id, Array.fill(draws)(v(r.nextInt(v.length))).mkString(" "))
      }
    }.toDF("doc_id", "text")
  }

  def writeDocuments(spark: SparkSession, out: String, n: Long,
      vocab: Array[String], seed: Long = 42L): Unit = {
    import spark.implicits._
    val langs = Array("en", "zh", "es", "fr", "de")
    val bc = spark.sparkContext.broadcast(vocab)
    spark.range(n)
      .as[Long]
      .mapPartitions { it =>
        val v = bc.value
        it.map { id =>
          val text = textFor(seed, id, v)
          (id, text, langs((id % langs.length).toInt),
            s"src${id % 50}", text.length.toLong)
        }
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(out)
  }

  def writeEmbeddings(spark: SparkSession, out: String, n: Long,
      dim: Int = 64, nLabels: Int = 10, seed: Long = 42L): Unit = {
    import spark.implicits._
    // per-label centers: scaled gaussians — within-label cosine lands in
    // the same weak-similarity regime as the driver corpus (~0.2-0.5)
    val centers = Array.tabulate(nLabels) { lab =>
      val r = new scala.util.Random(seed + 7777L * lab)
      Array.fill(dim)(0.55 * r.nextGaussian())
    }
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n)
      .as[Long]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { id =>
          val lab = (id % cs.length).toInt
          val r = rngFor(seed + 31L, id)
          val v = Array.tabulate(dim)(d => (cs(lab)(d) + r.nextGaussian()).toFloat)
          (id, v.toSeq, lab)
        }
      }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(out)
  }

  /** Generate the full decade-extension corpus dir (documents.parquet +
    * embeddings.parquet, 10× the sf0.1 sizes) and return its path. */
  def generate(spark: SparkSession, baseSfDir: String, outDir: String,
      docMult: Int = 10, embMult: Int = 10): String = {
    val vocab = graft.model.Tables.documents(spark, baseSfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().orderBy("w").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    val nDocs = graft.model.Tables.documents(spark, baseSfDir).count() * docMult
    val nEmb = graft.model.Tables.embeddings(spark, baseSfDir).count() * embMult
    writeDocuments(spark, s"$outDir/documents.parquet", nDocs, vocab)
    writeEmbeddings(spark, s"$outDir/embeddings.parquet", nEmb)
    outDir
  }
}
