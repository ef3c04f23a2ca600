package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the whole query registry. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every oracle entry has a query; keys are the SURVEY §2 names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${o -- q}")
    assert(q.nonEmpty && o.size >= 60)
  }

  test("no registry key is silently shadowed by the map concatenation") {
    import graft.ops._
    val parts = Seq(Relational.queries, Relational.windowQueries,
      PathFns.queries, Segments.queries, Text.queries, Dedup.queries,
      Similarity.queries, EventWindows.queries, Fingerprints.queries,
      Multimodal.queries, graft.sources.FsScan.queries, AsOf.queries,
      Scale.queries, graft.sources.Jdbc.queries,
      graft.sources.FileFormats.queries)
    val dupes = parts.flatMap(_.keys)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"keys registered twice (one shadows the other): $dupes")
    assert(SparkEntry.queries.size ==
      parts.map(_.size).sum + (SparkEntry.queries.keySet --
        parts.flatMap(_.keys).toSet).size)
  }

  test("every query is deterministic: two runs produce identical row sequences") {
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      val b = fn(spark, TestSpark.sf0001).collect().map(_.toString).toSeq
      if (a == b) None else Some(name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }

  test("entry() returns at least one row at sf0.001 (t1 gate)") {
    assert(SparkEntry.entry(spark).count() >= 1)
  }

  test("agg_approx_distinct HLL error is within 3x the configured rsd " +
      "(quantitative backing for its no-oracle status)") {
    import org.apache.spark.sql.functions._
    val rsd = 0.02 // must match the registered query's parameter
    val joined = graft.model.Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd).as("approx"))
      .collect()
    assert(joined.nonEmpty)
    val bad = joined.filter { r =>
      val exact = r.getLong(1).toDouble
      math.abs(r.getLong(2) - exact) / exact > 3 * rsd
    }
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("agg_approx_percentile rank error is within the sketch accuracy bound " +
      "(quantitative backing for its no-oracle status)") {
    import org.apache.spark.sql.functions._
    // accuracy=1000 guarantees rank error <= n/1000 per group; assert the
    // approximate quantile's RANK (not value) is within that bound + 1.
    val orders = graft.model.Tables.orders(spark, TestSpark.sf0001)
    val rows = orders.groupBy(col("o_orderpriority"))
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50a"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val grp = r.getString(0)
      val p50a = r.getDouble(1)
      val n = r.getLong(2)
      val rank = orders.filter(col("o_orderpriority") === grp)
        .filter(col("o_totalprice") <= p50a).count()
      val target = 0.5 * n
      val tol = n / 1000.0 + 1
      assert(math.abs(rank - target) <= tol + 1,
        s"group=$grp rank=$rank target=$target tol=$tol")
    }
  }

  test("bench stdout artifact stays under the driver's ~4KB tail capture " +
      "at worst-case widths for every registered query") {
    // worst case: every query takes 4-digit seconds with 3 decimals
    val results = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9999.999)
    val line = Bench.artifactLine(results, runs = 3,
      sfDir = "/root/testdata/sf0.1", errors = Seq.empty)
    assert(line.length < 4000, s"artifact line ${line.length}B would truncate")
    // and the total must be the LAST field (tail-capture survivability)
    assert(line.endsWith("}") && line.lastIndexOf("\"value\":") >
      line.lastIndexOf("\"queries\":"))
  }
}
