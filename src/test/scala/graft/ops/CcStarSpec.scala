package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The alternating large-star/small-star contraction must (a) agree with
  * min-label propagation label-for-label on every graph — both label a
  * component by its minimum node — and (b) converge in O(log n) rounds on
  * the high-diameter topology min-label cannot afford. All inputs are
  * deterministic.
  */
class CcStarSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("star CC == min-label CC on the real near-dup candidate graph") {
    val dir = "/root/testdata/sf0.001"
    val sigs = DedupOps.minhashSigs(
      graft.engine.Tables(spark, dir, "documents")
        .select("doc_id", "text"))
    val edges = DedupOps.minhashLshCandidates(sigs, 16, 4)
      .filter(col("est_jaccard") >= 0.5).select("a_id", "b_id")
      .localCheckpoint(true)
    val nodes = graft.engine.Tables(spark, dir, "documents")
      .select("doc_id")
    val minLabel = labelsOf(DedupOps.connectedComponents(edges, nodes))
    val star = labelsOf(DedupOps.connectedComponentsStar(edges, nodes))
    assert(star == minLabel)
    assert(minLabel.exists { case (n, l) => n != l },
      "graph had no non-trivial component — the test proves nothing")
  }

  test("star CC == min-label CC on a seeded random graph") {
    // Deterministic pseudo-random edges over 200 nodes: enough
    // components of varied shapes to exercise both phases.
    val edges = (0 until 150).map { i =>
      val a = (i * 7919L) % 200
      val b = (i * 104729L + 31) % 200
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toDF("a", "b")
    val nodes = (0L until 200L).toDF("node")
    val minLabel = labelsOf(DedupOps.connectedComponents(edges, nodes))
    val star = labelsOf(DedupOps.connectedComponentsStar(edges, nodes))
    assert(star == minLabel)
  }

  test("star CC contracts a 400-node path in <= 15 rounds (min-label " +
      "would need 399) and labels every node with the path minimum") {
    val n = 400L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L until n).toDF("node")
    // maxIter 15 IS the assertion: the loop require()s convergence
    // within it — ~2·log2(400) ≈ 17 with slack below, far under 399.
    val star = labelsOf(
      DedupOps.connectedComponentsStar(edges, nodes, maxIter = 15))
    assert(star.size == n && star.values.forall(_ == 0L),
      "path must collapse to one component rooted at 0")
  }
}
