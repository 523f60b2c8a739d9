package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** PageRank pinned on hand-built graphs with closed-form answers. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map { case (a, b) => (b, a) }).toDF("src", "dst")

  test("symmetric triangle: uniform rank is the fixed point, any iters") {
    val edges = undirected((1L, 2L), (2L, 3L), (1L, 3L))
    val r = Graph.pageRank(edges, iters = 5, damping = 0.85)
      .select("node", "rank").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("star graph: two hand-unrolled rounds, exact to 1e-12") {
    // center 0 — leaves 1,2,3; deg(0)=3, deg(leaf)=1, N=4
    val edges = undirected((0L, 1L), (0L, 2L), (0L, 3L))
    val r = Graph.pageRank(edges, iters = 2, damping = 0.85)
      .select("node", "rank").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // round 1: center ← 3·(.25/1), leaf ← .25/3
    val c1 = 0.15 / 4 + 0.85 * 0.75
    val l1 = 0.15 / 4 + 0.85 * (0.25 / 3)
    // round 2
    val c2 = 0.15 / 4 + 0.85 * (3 * l1)
    val l2 = 0.15 / 4 + 0.85 * (c1 / 3)
    assert(math.abs(r(0L) - c2) < 1e-12)
    Seq(1L, 2L, 3L).foreach(n => assert(math.abs(r(n) - l2) < 1e-12))
    // rank is a probability distribution (no dangling mass lost)
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("rank mass is conserved on an irregular graph") {
    val edges = undirected(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L), (5L, 6L))
    val rows = Graph.pageRank(edges, iters = 4, damping = 0.85)
      .select("node", "deg", "rank").collect()
    assert(rows.length == 6)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    // the degree column matches the undirected degree
    val deg = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 1L))
    // the hub out-ranks the leaf
    val rank = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rank(1L) > rank(6L))
  }
}
