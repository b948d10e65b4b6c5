package graft.ops

import graft.SparkSpec

/** Ground-truth quality bounds for the two approximate scale paths. Exact
  * twins (q43 Jaccard, q51 brute-force top-k) are oracle-verified; these
  * specs close the loop by asserting the approximate paths actually FIND
  * what the exact paths prove is there. Deterministic: every hash involved
  * (xxhash64, splitmix64 hyperplanes) is seeded, so these are stable
  * assertions, not flaky statistical tests.
  */
class DedupQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH candidates (q44) cover every exact-Jaccard >= 0.7 " +
      "ground-truth pair (q43)") {
    val rows = DedupOps.lshContainment(spark, dir, minJaccard = 0.7).collect()
    assert(rows.nonEmpty, "ground truth empty — the audit proves nothing")
    val missed = rows.filterNot(_.getAs[Boolean]("covered"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(missed.isEmpty, s"LSH missed near-dup pairs: ${missed.toSeq}")
  }

  test("ANN LSH (q53) recall@10 >= 0.8 on average vs exact top-k (q51)") {
    val rows = SimilarityOps.annRecall(spark, dir).collect()
    assert(rows.length == 5) // one row per query vector
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"avg recall@10 $avg (per-query: $recalls)")
  }
}
