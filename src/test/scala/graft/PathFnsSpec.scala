package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PathFns

class PathFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(path: String, c: org.apache.spark.sql.Column): String =
    Seq(path).toDF("p").select(c.as("r")).as[String].collect().head

  test("pathCutoff strips through the marker — documented prefix semantics, " +
    "not the reference's lstrip charset bug (bulkupload.py:50-51)") {
    assert(one("/users/Doe/assets/img.jpg",
      PathFns.pathCutoff(col("p"), "Doe")) == "assets/img.jpg")
    // the reference's lstrip("Doe") on "Doeville/x" would also eat 'e','o'
    // chars from what follows; ours only removes the one prefix:
    assert(one("Doeville/x", PathFns.pathCutoff(col("p"), "Doe")) == "ville/x")
    // marker absent → path unchanged
    assert(one("a/b/c", PathFns.pathCutoff(col("p"), "ZZZ")) == "a/b/c")
  }

  test("pathCutoff result never has a leading slash") {
    for (p <- Seq("/a/Doe/b", "Doe/b", "/Doe/x/y", "x/Doe"))
      assert(!one(p, PathFns.pathCutoff(col("p"), "Doe")).startsWith("/"))
  }

  test("stripLeadingSlash implements documented startswith intent " +
    "(reference bug: only fires on literal \"/\", bulkupload.py:53-56)") {
    assert(one("/a/b", PathFns.stripLeadingSlash(col("p"))) == "a/b")
    assert(one("a/b", PathFns.stripLeadingSlash(col("p"))) == "a/b")
    assert(one("/", PathFns.stripLeadingSlash(col("p"))) == "")
  }

  test("basename matches split('/')[-1] (filesegmenter.py:14)") {
    assert(one("a/b/c.txt", PathFns.basename(col("p"))) == "c.txt")
    assert(one("c.txt", PathFns.basename(col("p"))) == "c.txt")
  }

  test("segmentName zero-pads to 4 digits") {
    val r = Seq(("f", 3)).toDF("n", "i")
      .select(PathFns.segmentName(col("n"), col("i")).as("r"))
      .as[String].collect().head
    assert(r == "f-0003.txt")
  }
}
