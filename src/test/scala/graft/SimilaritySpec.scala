package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.model.Tables

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    ).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 9).as("c"))
      .as[Double].collect()
    assert(got(0) == 1.0)
    assert(got(1) == 0.0)
  }

  test("LSH top-k recall vs brute force is usable (>= 0.4 on sf0.001)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, col("vec_id") < 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
    // and the approximate candidate set must be much smaller than n*q
    assert(approx.size <= exact.size)
  }

  test("IVF top-k recall vs brute force is usable (>= 0.4 on sf0.001)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, col("vec_id") < 10, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("IVF is deterministic across runs") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val a = Similarity.ivfTopK(emb, col("vec_id") < 5, 3)
      .collect().map(_.toString).sorted
    val b = Similarity.ivfTopK(emb, col("vec_id") < 5, 3)
      .collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("brute-force top-k neighbors are genuinely the nearest (spot check q=0)") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val all = emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val q = all(0L).map(_.toDouble).toArray
    def cos(b: Seq[Float]): Double = {
      val bd = b.map(_.toDouble).toArray
      val dot = q.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(q.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val expectTop = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val got = Similarity.bruteForceTopK(emb, col("vec_id") === 0, 5)
      .orderBy("rnk").select("n_id").as[Long].collect()
    assert(got.toSeq == expectTop)
  }
}
