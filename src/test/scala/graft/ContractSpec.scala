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
}
