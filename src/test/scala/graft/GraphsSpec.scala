package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graphs
import graft.model.Tables

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pagerank: integer mass conserved to ~1e-9, bit-deterministic " +
      "across runs, hubs dominate leaves, orphans sit on the teleport floor") {
    val rows = Graphs.queries("graph_pagerank")(spark, TestSpark.sf0001)
      .collect()
    val n = rows.length
    val total = rows.map(_.getLong(1)).sum
    // floor-division leak only: < ~(deg+100) units per node per iteration
    assert(total <= 1000000000000L && total >= 999999000000L,
      s"mass off: $total")
    val again = Graphs.queries("graph_pagerank")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "fixed-point ranks must be run-to-run identical")
    val hubMin = rows.filter(_.getLong(0) < 50).map(_.getLong(1)).min
    val leafMax = rows.filter(_.getLong(0) >= 50).map(_.getLong(1)).max
    assert(hubMin > leafMax,
      s"hub centrality must dominate leaves: $hubMin vs $leafMax")
    // the last row of items has no in-links: rank is exactly the
    // integer teleport term
    val teleport = (15L * (1000000000000L / n)) / 100L
    val orphans = rows.filter(_.getLong(3) == 0L)
    assert(orphans.nonEmpty && orphans.forall(_.getLong(1) == teleport))
  }

  test("personalized pagerank: nonzero rank is EXACTLY the set " +
      "reachable from the portal seeds, seeds carry the teleport floor, " +
      "and the 5+5 staged restart equals the uninterrupted 10 rounds") {
    val rows = Graphs.queries("graph_pagerank_personalized")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // edges point items → hubs and hubs → next hub, so from the seed
    // hubs the reachable set is precisely the 50-hub ring: every hub
    // nonzero, every item exactly zero (no mass flows "down").
    val (hubs, items) = rows.partition(_._1 < 50)
    assert(hubs.length == 50 && hubs.forall(_._2 > 0L),
      "all ring hubs must receive personalized mass")
    assert(items.forall(_._2 == 0L),
      "items are unreachable from the seeds — rank must be exactly 0")
    // a seed's rank is at least its own teleport term
    val share = 1000000000000L / 5L
    val seedFloor = (15L * share) / 100L
    Seq(0L, 10L, 20L, 30L, 40L).foreach { s =>
      val r = rows.find(_._1 == s).get._2
      assert(r >= seedFloor, s"seed $s below teleport floor: $r")
    }
    // total mass ≤ S (floor leak only), and concentrated vs uniform:
    // the top-5 personalized ranks are the seeds themselves
    assert(rows.map(_._2).sum <= 1000000000000L)
    val top5 = rows.sortBy(-_._2).take(5).map(_._1).toSet
    assert(top5 == Set(0L, 10L, 20L, 30L, 40L), top5.toString)
    // exact-integer restartability, directly: staged == uninterrupted
    val resumed = Graphs.queries("graph_pagerank_personalized_resume")(
      spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(resumed.toSeq == rows.toSeq)
  }

  test("hits: all 50 site hubs saturate the authority max exactly " +
      "(identical in-structure), leaves stay an order below, unlinked " +
      "nodes score zero, and the hub-score max is attained") {
    val rows = Graphs.queries("graph_hits")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (hubs, leaves) = rows.partition(_._1 < 50)
    assert(hubs.length == 50 && hubs.forall(_._2 == 1000000L))
    assert(leaves.map(_._2).max < 100000L)
    // the last row of items has no in-links at all -> zero authority
    assert(rows.count(_._2 == 0L) == 50)
    assert(rows.map(_._3).max == 1000000L)
  }

  test("bfs depth: closed-form distances — hub m sits at undirected " +
      "ring distance from the nearest portal seed (0/10/20/30/40), " +
      "every item is one hop past its hub, and all nodes are reached") {
    val rows = Graphs.queries("graph_bfs_depth")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.values.forall(_ >= 0L), "graph is connected: no -1 rows")
    val seeds = Seq(0L, 10L, 20L, 30L, 40L)
    for ((id, hop) <- rows) {
      val m = id % 50
      val ringDist = seeds.map(s => {
        val d = math.abs(m - s); math.min(d, 50 - d)
      }).min
      val expected = ringDist + (if (id >= 50) 1L else 0L)
      assert(hop == expected, s"doc $id: got $hop, want $expected")
    }
    assert(rows.values.max == 6L, "diameter from the seed set is 6")
  }

  test("link prediction: scores descend, the best missing links are the " +
      "distance-2 chain pairs around degree-2 items (J = 2/3), and no " +
      "predicted pair is an existing edge") {
    val rows = Graphs.queries("graph_link_prediction")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.length == 20)
    assert(rows.map(_._5).toSeq == rows.map(_._5).toSeq.sorted.reverse)
    assert(rows.head._5 == 0.666667,
      s"top missing-link score should be 2/3, got ${rows.head._5}")
    // no predicted pair may be an actual crawl edge
    def isEdge(a: Long, b: Long): Boolean =
      (a < 50 && b < 50 && ((a + 1) % 50 == b || (b + 1) % 50 == a)) ||
        (b >= 50 && (b % 50 == a || b - 50 == a)) ||
        (a >= 50 && (a % 50 == b || a - 50 == b))
    rows.foreach { case (_, a, b, _, _) =>
      assert(!isEdge(a, b), s"($a,$b) is an existing edge")
    }
  }

  test("degree-capped link prediction: on a graph where every degree " +
      "is under the cap it equals the exact key row-for-row, and at " +
      "sf0.01 (hub degrees 12 > a cap of 8) hub-mediated-only pairs " +
      "drop while low-degree wedge pairs keep their exact scores") {
    // sf0.001's crawl graph is the 50-hub ring alone (no items): every
    // degree is 2, far under 64, so capped ≡ exact exactly
    val exact = Graphs.queries("graph_link_prediction")(
      spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    val capped = Graphs.queries("graph_link_prediction_capped")(
      spark, TestSpark.sf0001).collect().map(_.toString).toSeq
    assert(capped == exact,
      "under-cap graph: the stop-list must be a no-op")
    // sf0.01: hubs have degree 12 (10 spokes + 2 ring); cap 8 excludes
    // them as wedge CENTERS, so every surviving pair's count came
    // through low-degree centers and must equal its exact-key count
    val d01 = "/root/testdata/sf0.01"
    val ex = Graphs.linkPrediction(
        graft.model.Tables.documents(spark, d01), k = 1000000)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val cp = Graphs.linkPredictionCapped(
        graft.model.Tables.documents(spark, d01), k = 1000000, maxDeg = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cp.nonEmpty)
    cp.foreach { case (a, b, inter) =>
      assert(ex((a, b)) >= inter,
        s"($a,$b): capped count must be a subset of the exact wedges")
    }
    // and the cap genuinely drops hub-mediated mass at this SF
    assert(cp.length < ex.size,
      "the cap must exclude hub-only pairs at sf0.01")
  }

  test("triangles: closed-form counts — every triangle is {item k, " +
      "item k-50, hub k%50} for k >= 100, so credits total 3*(n-100) " +
      "and each hub sits in exactly n/50-2 of them") {
    val out = Graphs.queries("graph_triangles")(spark, TestSpark.sf0001)
      .collect()
    val n = Tables.documents(spark, TestSpark.sf0001).count()
    assert(out.map(_.getLong(1)).sum == 3 * (n - 100))
    val perHub = n / 50 - 2
    assert(out.filter(_.getLong(0) < 50).forall(_.getLong(1) == perHub))
  }
}
