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

  test("MinHash-LSH candidates (q44) cover the full-corpus exact-Jaccard " +
      "ground truth (uncapped q43): 100% at j >= 0.9, >= 90% overall") {
    // Truth is the WHOLE corpus, not the capped q43 range. The assertion
    // is stratified by the 16x4 LSH s-curve (P(candidate|j) = 1-(1-j^4)^4,
    // 50% point j ~ 0.707): demanding 100% containment at j = 0.7 would
    // assert something the parameterization doesn't promise. All hashes
    // are seeded, so measured coverage is deterministic.
    val rows = DedupOps.lshContainment(spark, dir, minJaccard = 0.7).collect()
    assert(rows.nonEmpty, "ground truth empty — the audit proves nothing")
    val high = rows.filter(_.getAs[Double]("jaccard") >= 0.9)
    assert(high.nonEmpty, "no j >= 0.9 truth pairs — the audit proves nothing")
    val missedHigh = high.filterNot(_.getAs[Boolean]("covered"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(missedHigh.isEmpty,
      s"LSH missed high-certainty near-dup pairs: ${missedHigh.toSeq}")
    val covered = rows.count(_.getAs[Boolean]("covered"))
    assert(covered.toDouble / rows.length >= 0.9,
      s"overall containment $covered/${rows.length} below 0.9")
  }

  test("IVF probe search (q56) recall@10 >= 0.8 on average vs exact " +
      "top-k (q51)") {
    val rows = SimilarityOps.ivfRecall(spark, dir).collect()
    assert(rows.length == 5)
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"avg IVF recall@10 $avg (per-query: $recalls)")
  }

  test("ANN LSH (q53) recall@10 >= 0.8 on average vs exact top-k (q51)") {
    val rows = SimilarityOps.annRecall(spark, dir).collect()
    assert(rows.length == 5) // one row per query vector
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"avg recall@10 $avg (per-query: $recalls)")
  }
}
