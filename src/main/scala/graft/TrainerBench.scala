package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the SCALE_r10 trainer A/B: time the SEQUENTIAL
  * BPE training loop (one Spark action per merge round) against the
  * BATCHED loop (k lazy rounds per action, VERDICT r9 "Next round" #2)
  * on the same corpus and rounds, and time the production-scale greedy
  * encoder over the distinct vocabulary at synthetic merge depths the
  * expression chain cannot express (it stack-overflows near 1,000
  * nodes — measured in TermStatsSpec). Emits one JSON line per
  * measurement; the tables land in SCALE_r10.md.
  *
  * Usage: runMain graft.TrainerBench [sfDir ...]
  * (defaults to the three driver SFs; rounds via SPARK_GRAFT_ROUNDS,
  * default 10 — the registered keys' setting.)
  */
object TrainerBench {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // LONG-RUN mode (VERDICT r10 #2's done-criterion): train the
    // incremental loop alone for SPARK_GRAFT_LONG_ROUNDS merges — the
    // bounded-wall-time demonstration at a depth the recounting loops
    // cannot reasonably reach. The driver corpus EXHAUSTS at 89 merges
    // at every SF (one shared template vocabulary — every distinct
    // word fully fuses; measured: 89 merges in 23.2 s at sf0.01,
    // 32.1 s at sf0.1), so depth needs pair DIVERSITY: generate a
    // deterministic wide-vocabulary corpus — 20,000 distinct 8-char
    // pseudo-words (fixed-width base-26 of (index, index-hash), so
    // distinctness is by construction), 5,000 docs × 60 seeded-uniform
    // draws. batch = 1 is the incremental trainer's best operating
    // point (its per-argmax action is tiny, so checkpoint cadence —
    // not action count — is the dial; measured in the rounds=10
    // table).
    sys.env.get("SPARK_GRAFT_LONG_ROUNDS").foreach { lr =>
      import spark.implicits._
      def b26f(x0: Long, w: Int): String = {
        val cs = new Array[Char](w)
        var x = x0
        var k = w - 1
        while (k >= 0) { cs(k) = ('a' + (x % 26)).toChar; x /= 26; k -= 1 }
        new String(cs)
      }
      val vocabArr = Array.tabulate(20000)(i =>
        b26f(i, 4) + b26f((i.toLong * 2654435761L) & 0xfffffL, 4))
      val bcV = spark.sparkContext.broadcast(vocabArr)
      val docsL = spark.range(5000L).as[Long].mapPartitions { it =>
        val v = bcV.value
        it.map { id =>
          val r = new scala.util.Random(42L * 1000003L + id * 2654435761L)
          (id, Array.fill(60)(v(r.nextInt(v.length))).mkString(" "))
        }
      }.toDF("doc_id", "text")
      docsL.count()
      val (m, t) = time(graft.ops.TermStats.bpeLearnIterIncremental(
        docsL, lr.toInt, batch = 1))
      println(s"""{"corpus":"synthetic-widevocab-20k","docs":5000,""" +
        s""""long_rounds":${lr.toInt},""" +
        s""""merges_learned":${m.size},"incremental_s":${r3(t)}}""")
      spark.stop()
      return
    }
    for (sf <- sfs) {
      val docs = graft.model.Tables.documents(spark, sf)
      docs.count() // warm the scan
      // JIT/codegen warm-up on the smallest corpus shape, then
      // min-of-3 steady state for all three loops; equality asserted so
      // the timing claim and the bit-identity claim are the same run.
      val seqT = (1 to 3).map(_ =>
        time(graft.ops.TermStats.bpeLearnIter(docs, rounds))).minBy(_._2)
      val batT = (1 to 3).map(_ =>
        time(graft.ops.TermStats.bpeLearnIterBatched(docs, rounds,
          batch = 5))).minBy(_._2)
      val incT = (1 to 3).map(_ =>
        time(graft.ops.TermStats.bpeLearnIterIncremental(docs, rounds,
          batch = 5))).minBy(_._2)
      require(seqT._1 == batT._1, "batched trainer diverged from sequential")
      require(seqT._1 == incT._1,
        "incremental trainer diverged from sequential")
      println(s"""{"sf":"$sf","rounds":$rounds,""" +
        s""""sequential_s":${r3(seqT._2)},"batched_s":${r3(batT._2)},""" +
        s""""incremental_s":${r3(incT._2)},""" +
        s""""speedup":${r3(seqT._2 / batT._2)},""" +
        s""""speedup_incr":${r3(seqT._2 / incT._2)}}""")
    }
    // r11 per-config table (VERDICT r10 #7 + #2): driver actions and
    // recount-row volume per trainer/batch config on sf0.01 — the
    // in-tree baseline the incremental trainer's win is measured
    // against. Recount volume is batch-INDEPENDENT (each pick explodes
    // once; batching amortizes actions and replace-chain map work), so
    // the volume line prints once: full = Σ_r fullRows_r (every
    // recounting trainer), incremental = fullRows_0 + Σ_r Δ-rows.
    val docsAcct = graft.model.Tables.documents(spark, sfs(1))
    val table = graft.ops.TermStats.bpeLearnIter(docsAcct, rounds)
    val vols = graft.ops.TermStats.recountVolumes(docsAcct, table)
    val fullRows = vols.map(_._1).sum
    val incrRows = vols.headOption.map(_._1).getOrElse(0L) +
      vols.map(_._2).sum
    println(s"""{"sf":"${sfs(1)}","rounds":$rounds,""" +
      s""""recount_rows_full":$fullRows,""" +
      s""""recount_rows_incremental":$incrRows,""" +
      s""""volume_ratio":${r3(fullRows.toDouble / math.max(1L, incrRows))}}""")
    for (b <- Seq(1, 5, 10)) {
      // batched: 2 actions per batch; incremental: 1 argmax per round
      // + 2 checkpoints per batch boundary (batch dials lineage, not
      // the action count — the win is recount volume)
      val actions = 2 * ((rounds + b - 1) / b)
      val actionsIncr = rounds + 2 * ((rounds + b - 1) / b)
      val batB = (1 to 3).map(_ =>
        time(graft.ops.TermStats.bpeLearnIterBatched(docsAcct, rounds,
          batch = b))).minBy(_._2)
      val incB = (1 to 3).map(_ =>
        time(graft.ops.TermStats.bpeLearnIterIncremental(docsAcct, rounds,
          batch = b))).minBy(_._2)
      require(batB._1 == table && incB._1 == table,
        s"trainer diverged at batch=$b")
      println(s"""{"sf":"${sfs(1)}","rounds":$rounds,"batch":$b,""" +
        s""""actions_batched":$actions,"actions_incremental":$actionsIncr,""" +
        s""""batched_s":${r3(batB._2)},""" +
        s""""incremental_s":${r3(incB._2)}}""")
    }
    // scaled greedy encoder at depths the expression chain cannot host:
    // encode the sf0.1 distinct vocabulary under 1,000 and 5,000
    // synthetic merges (plan size is O(1) in the merge count).
    val docs01 = graft.model.Tables.documents(spark, sfs.last)
    for (n <- Seq(1000, 5000)) {
      val merges = graft.ops.TermStats.syntheticMerges(n)
      val t = (1 to 3).map(_ => time(
        graft.ops.TermStats.bpeApplyScaled(docs01, merges)
          .queryExecution.toRdd.count())).map(_._2).min
      println(s"""{"sf":"${sfs.last}","scaled_encode_merges":$n,""" +
        s""""apply_s":${r3(t)}}""")
    }
    spark.stop()
  }
}
