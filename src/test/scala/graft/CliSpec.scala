package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.{BulkUpload, PrepareUpload}
import graft.sink.{FlakyStore, LocalFsStore, RetryingStore}
import java.nio.file.{Files, Paths}

/** End-to-end reference-equivalence: the two CLIs, including the
  * re-prepare / resume behaviors the readme documents (readme.md:42). */
class CliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(root: String, rel: String, content: String): Unit = {
    val p = Paths.get(root, rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("prepare -> upload -> resume full cycle") {
    val src = Files.createTempDirectory("graft-cli-src").toString
    val mroot = Files.createTempDirectory("graft-cli-m").toString
    val store = Files.createTempDirectory("graft-cli-store").toString
    val cutoff = Paths.get(src).getFileName.toString

    write(src, "a/x.txt", "XX")
    write(src, "a/b/y.txt", "YY")
    write(src, "z.txt", "ZZ")

    // index
    val p1 = PrepareUpload.run(spark, src, mroot)
    assert(p1.total == 3 && p1.appended == 3)

    // re-prepare: no duplicate rows (fixes the reference defect)
    val p2 = PrepareUpload.run(spark, src, mroot)
    assert(p2.total == 3 && p2.appended == 0)

    // new file appears -> only it is appended, id continues
    write(src, "w.txt", "WW")
    val p3 = PrepareUpload.run(spark, src, mroot)
    assert(p3.total == 4 && p3.appended == 1)

    // upload with y.txt permanently failing
    FlakyStore.counts.clear()
    val u1 = BulkUpload.run(spark, store, mroot, parallelism = 2,
      cutoff = Some(cutoff),
      mkStore = root => new FlakyStore(root, failTimes = 99, "y.txt"))
    assert(u1.attempted == 4)
    assert(u1.uploaded == 3 && u1.failed == 1)
    assert(u1.totalUploaded == 3 && u1.total == 4)
    // keys preserve the folder structure below the cutoff
    assert(Files.readString(Paths.get(store, "a/x.txt")) == "XX")
    assert(Files.readString(Paths.get(store, "z.txt")) == "ZZ")
    assert(!Files.exists(Paths.get(store, "a/b/y.txt")))
    val errLog = spark.read.text(s"$mroot/.upload.error.log").count()
    assert(errLog == 1)
    // the progress file must report a real (nonzero) uploads/second — the
    // reference's most visible runtime behavior (set_speed).
    val prog = Files.readString(Paths.get(mroot, ".upload.out"))
    val rateRe = """at (\d+\.\d+) uploads/second""".r
    val rate = rateRe.findFirstMatchIn(prog).map(_.group(1).toDouble)
    assert(rate.exists(_ > 0.0), s"progress line lacks a live rate: $prog")

    // resume: only the failed row is attempted, then everything is done
    val u2 = BulkUpload.run(spark, store, mroot, parallelism = 2,
      cutoff = Some(cutoff),
      mkStore = root => new RetryingStore(new LocalFsStore(root)))
    assert(u2.attempted == 1)
    assert(u2.uploaded == 1 && u2.failed == 0)
    assert(u2.totalUploaded == 4 && u2.total == 4)
    assert(Files.readString(Paths.get(store, "a/b/y.txt")) == "YY")

    // idempotent third run: nothing pending
    val u3 = BulkUpload.run(spark, store, mroot, parallelism = 2,
      cutoff = Some(cutoff))
    assert(u3.attempted == 0 && u3.totalUploaded == 4)
  }

  test("re-prepare after an EMPTY first index neither NPEs nor miscounts") {
    // regression: max(id) over an empty manifest is NULL; a first run
    // against an empty source dir writes an empty snapshot, files appear
    // later, and the second run must continue from id 0.
    val src = Files.createTempDirectory("graft-cli-empty").toString
    val mroot = Files.createTempDirectory("graft-cli-empty-m").toString
    val p1 = PrepareUpload.run(spark, src, mroot)
    assert(p1.total == 0 && p1.appended == 0)
    write(src, "a.txt", "A")
    write(src, "b/c.txt", "C")
    val p2 = PrepareUpload.run(spark, src, mroot)
    assert(p2.total == 2 && p2.appended == 2)
    val ids = graft.sink.ManifestStore.read(spark, mroot)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("flagship pipeline with NOTHING pending reports zeros, not an NPE") {
    // every doc_id % 3 == 0 ⇒ the derived manifest is fully uploaded, so
    // the upload stage sees zero rows and every sum/max aggregate in the
    // report is null — the regression the null guards cover.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-allup").toString
    Seq((0L, "s1", "alpha", 5L), (3L, "s1", "beta", 4L), (6L, "s2", "gamma", 5L))
      .toDF("doc_id", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rep = Pipeline.run(spark, dir).head()
    assert(rep.getLong(0) == 3)     // total
    assert(rep.getLong(1) == 3)     // uploaded
    assert(rep.getDouble(2) == 100.0)
    assert(rep.getLong(3) == 0)     // failed
    assert(rep.getInt(4) == 0)      // max_attempts (null -> 0)
  }

  test("flagship payload attach is an equi-join, not a nested-loop join") {
    val plan = Pipeline.attachPayload(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
