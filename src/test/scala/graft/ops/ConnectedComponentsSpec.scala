package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long],
      maxIter: Int = 25): Map[Long, Long] =
    DedupOps.connectedComponents(
        edges.toDF("a", "b"), nodes.toDF("n"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated node resolve to min-id labels") {
    // chain 1-2-3-4 (diameter forces propagation over >1 hop),
    // triangle 10-11-12, isolated 20
    val labels = cc(
      edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
        (10L, 12L)),
      nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long chain converges within the diameter bound") {
    // path 0-1-2-...-9: label 0 must travel 9 hops
    val edges = (0L until 9L).map(i => (i, i + 1))
    val labels = cc(edges, 0L to 9L, maxIter = 12)
    assert(labels.values.toSet == Set(0L))
  }

  test("non-convergence within maxIter fails loudly") {
    val edges = (0L until 9L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      cc(edges, 0L to 9L, maxIter = 2)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("edge direction does not matter (labels flow both ways)") {
    // edges listed high->low: min label still reaches everyone
    val labels = cc(Seq((5L, 1L), (9L, 5L)), Seq(1L, 5L, 9L))
    assert(labels.values.toSet == Set(1L))
  }
}
