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

  // ------------------------------------------------------------------
  // EVENTS + TPC-H decade extension (r15, VERDICT r14 "Next round"
  // #4): the audio SPI convoy and the link-prediction wedge mass were
  // both invisible below sf1 — the events/relational keys (session
  // self-joins, lag-168 joins, types² fan-outs) deserve the same
  // full-decade evidence. Same regime as the driver tables (schema,
  // value ranges, category sets profiled from sf0.1), scaled 10× the
  // REALISTIC way: events grow by USERS at fixed per-user density
  // (sessionize/self-join keys scale with per-user density, which
  // production growth holds roughly constant), lineitem/orders grow
  // with their FK cardinalities scaled together so join fan-ins stay
  // fixed. All rows derive from (seed, id) — deterministic,
  // embarrassingly parallel, no driver-side data.
  // ------------------------------------------------------------------

  /** `spanDays` compresses the window (default = the driver table's
    * 30 days): a SHORTER span at the same row count raises events/sec
    * density — the regime where bucket-pre-aggregated window forms
    * separate from per-event ones (SCALE_r15 §3's dense-density
    * measurement). */
  def writeEvents(spark: SparkSession, out: String, n: Long,
      nUsers: Long, seed: Long = 42L, spanDays: Int = 30): Unit = {
    import spark.implicits._
    val types = Array("click", "error", "purchase", "signup", "view")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val spanMs = spanDays.toLong * 24 * 3600 * 1000
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val r = rngFor(seed + 97L, id)
        // ts increases with event_id (the driver table is time-ordered);
        // the jitter keeps inter-event gaps irregular for session keys
        val ts = new java.sql.Timestamp(
          t0 + (spanMs.toDouble * id / n).toLong + r.nextInt(30000))
        // exponential value (driver table: mean ≈ 50, max ≈ 560)
        val v = math.min(600.0,
          math.rint(-math.log(1.0 - r.nextDouble()) * 50.0 * 100) / 100)
        (id, ts, r.nextLong(nUsers), types(r.nextInt(types.length)), v,
          s"""{"k": ${r.nextInt(100)}}""")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(out)
  }

  /** l_orderkey is derived as id/4 (4 lines per order), so the row
    * count is DERIVED from nOrders (n = 4 × nOrders) rather than
    * taken as a parameter — a caller-supplied n that disagreed with
    * nOrders would silently produce dangling foreign keys into the
    * orders table (ADVICE r15 #3). */
  def writeLineitem(spark: SparkSession, out: String,
      nOrders: Long, nParts: Long, nSupp: Long, seed: Long = 42L): Unit = {
    import spark.implicits._
    val n = 4L * nOrders
    val flags = Array("A", "N", "R")
    val stats = Array("F", "O")
    val t0 = java.sql.Timestamp.valueOf("1995-01-02 00:00:00").getTime
    val dayMs = 24L * 3600 * 1000
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val r = rngFor(seed + 131L, id)
        (id / 4, r.nextLong(nParts), r.nextLong(nSupp),
          (id % 4 + 1).toInt, (1 + r.nextInt(50)).toDouble,
          math.rint((900.0 + r.nextDouble() * 104100.0) * 100) / 100,
          r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
          flags(r.nextInt(3)), stats(r.nextInt(2)),
          new java.sql.Timestamp(t0 + r.nextLong(2500) * dayMs))
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(out)
  }

  def writeOrders(spark: SparkSession, out: String, n: Long,
      nCust: Long, seed: Long = 42L): Unit = {
    import spark.implicits._
    val stats = Array("O", "P", "F")
    val prios = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    val t0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime
    val dayMs = 24L * 3600 * 1000
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val r = rngFor(seed + 137L, id)
        (id, r.nextLong(nCust), stats(r.nextInt(3)),
          math.rint((1000.0 + r.nextDouble() * 499000.0) * 100) / 100,
          new java.sql.Timestamp(t0 + r.nextLong(2400) * dayMs),
          prios(r.nextInt(5)))
      }
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(out)
  }

  def writeCustomer(spark: SparkSession, out: String, n: Long,
      seed: Long = 42L): Unit = {
    import spark.implicits._
    val segs = Array("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val r = rngFor(seed + 139L, id)
        (id, f"Customer#$id%09d", r.nextInt(25),
          math.rint((-1000.0 + r.nextDouble() * 11000.0) * 100) / 100,
          segs(r.nextInt(5)))
      }
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(out)
  }

  def writePart(spark: SparkSession, out: String, n: Long,
      seed: Long = 42L): Unit = {
    import spark.implicits._
    val adjs = Array("large", "hot", "blue", "green", "small",
      "red", "dark", "pale", "light", "round")
    val nouns = Array("ring", "bolt", "gear", "cap", "tube",
      "pin", "disk", "rod", "clip", "plate")
    val types = Array("LARGE", "MEDIUM", "ECONOMY", "PROMO", "SMALL")
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val r = rngFor(seed + 149L, id)
        (id, s"${adjs(r.nextInt(10))} ${nouns(r.nextInt(10))}",
          s"Brand#${1 + r.nextInt(25)}", types(r.nextInt(5)),
          1 + r.nextInt(50),
          math.rint((900.0 + r.nextDouble() * 99.9) * 100) / 100)
      }
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(out)
  }

  def writeSupplier(spark: SparkSession, out: String, n: Long,
      seed: Long = 42L): Unit = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val r = rngFor(seed + 151L, id)
        (id, f"Supplier#$id%09d", r.nextInt(25),
          math.rint(r.nextDouble() * 999900) / 100)
      }
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(out)
  }

  /** Generate the full decade-extension corpus dir and return its
    * path. IDEMPOTENT PER TABLE (r15): a table whose parquet already
    * exists is kept — so a pre-r15 dir reused via SPARK_GRAFT_SF1_DIR
    * gains the new events/TPC-H tables without regenerating its
    * documents/embeddings. region/nation are copied from the base dir
    * verbatim (5/25 fixed rows — they don't scale). */
  def generate(spark: SparkSession, baseSfDir: String, outDir: String,
      docMult: Int = 10, embMult: Int = 10): String = {
    // Completion is gated on the committer's _SUCCESS marker, not bare
    // directory existence: a generation that crashed mid-write leaves a
    // partial parquet dir with no marker, and a reused
    // SPARK_GRAFT_SF1_DIR would otherwise keep it forever, silently
    // corrupting later scale evidence (ADVICE r15 #2). Every table here
    // is written by Spark's FileOutputCommitter, which emits _SUCCESS
    // on commit; an unmarked dir is regenerated (mode("overwrite")
    // clears the partial remains).
    def need(name: String): Boolean =
      !new java.io.File(s"$outDir/$name.parquet/_SUCCESS").exists()
    if (need("documents")) {
      val vocab = graft.model.Tables.documents(spark, baseSfDir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .distinct().orderBy("w").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect()
      val nDocs = graft.model.Tables.documents(spark, baseSfDir).count() * docMult
      writeDocuments(spark, s"$outDir/documents.parquet", nDocs, vocab)
    }
    if (need("embeddings")) {
      val nEmb = graft.model.Tables.embeddings(spark, baseSfDir).count() * embMult
      writeEmbeddings(spark, s"$outDir/embeddings.parquet", nEmb)
    }
    val m = docMult.toLong
    if (need("events")) writeEvents(spark, s"$outDir/events.parquet",
      100000L * m, 1500L * m)
    if (need("lineitem")) writeLineitem(spark, s"$outDir/lineitem.parquet",
      150000L * m, 20000L * m, 1000L * m)
    if (need("orders")) writeOrders(spark, s"$outDir/orders.parquet",
      150000L * m, 15000L * m)
    if (need("customer")) writeCustomer(spark,
      s"$outDir/customer.parquet", 15000L * m)
    if (need("part")) writePart(spark, s"$outDir/part.parquet", 20000L * m)
    if (need("supplier")) writeSupplier(spark,
      s"$outDir/supplier.parquet", 1000L * m)
    for (t <- Seq("region", "nation") if need(t))
      spark.read.parquet(s"$baseSfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    outDir
  }
}
