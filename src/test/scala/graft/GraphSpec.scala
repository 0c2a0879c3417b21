package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** PageRank goldens: closed-form checks on graphs small enough to compute
  * by hand, plus the invariants any correct implementation must hold. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Double)].collect().toMap

  test("symmetric triangle stays uniform at every iteration") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val pr = ranks(tri, iters = 4)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("star golden: hub accumulates, leaves match the hand-computed value") {
    // a <-> b, a <-> c: after one iteration from uniform,
    // pr(a) = 0.15/3 + 0.85·(1/3 + 1/3); pr(b) = pr(c) = 0.15/3 + 0.85·(1/3)/2
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
    val pr = ranks(star, iters = 1)
    assert(math.abs(pr(1L) - (0.15 / 3 + 0.85 * (2.0 / 3))) < 1e-12)
    assert(math.abs(pr(2L) - (0.15 / 3 + 0.85 / 6)) < 1e-12)
    assert(math.abs(pr(2L) - pr(3L)) < 1e-15)
  }

  test("mass conservation on dangling-free graphs; sink leaks as documented") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(math.abs(ranks(cycle, 3).values.sum - 1.0) < 1e-9)
    // 1 -> 2 only: node 2 is dangling, its damped mass leaks each round
    val chain = Seq((1L, 2L))
    assert(ranks(chain, 3).values.sum < 1.0)
  }
}
