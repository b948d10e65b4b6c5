package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {

  import spark.implicits._

  private def shingles = {
    VectorExpressions.register(spark)
    Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 30L), (2L, 40L),
      (3L, 999L))
      .toDF("doc_id", "h")
  }

  test("signature = elementwise min of per-permutation mixes") {
    val got = shingles.groupBy("doc_id")
      .agg(expr("minhash_sig(h, 4)").as("sig"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    val expect = Map(
      1L -> Seq(10L, 20L, 30L), 2L -> Seq(20L, 30L, 40L), 3L -> Seq(999L))
      .map { case (d, hs) =>
        d -> (0 until 4).map(p => hs.map(h => MinHashAgg.mix(h, p)).min)
      }
    got.foreach { case (d, sig) => assert(sig == expect(d), s"doc $d") }
  }

  test("partition-order independence: repartitioned input, same signature") {
    val a = shingles.groupBy("doc_id")
      .agg(expr("minhash_sig(h, 8)").as("sig"))
    val b = shingles.repartition(7, col("h")).groupBy("doc_id")
      .agg(expr("minhash_sig(h, 8)").as("sig"))
    val sa = a.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val sb = b.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(sa == sb)
  }

  test("shared shingles give equal signature positions (LSH premise)") {
    val sigs = shingles.groupBy("doc_id")
      .agg(expr("minhash_sig(h, 16)").as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq)
    val matches = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    // docs 1 and 2 share 2 of 4 distinct shingles → expect SOME agreement,
    // and doc 3 (disjoint) must agree nowhere with doc 1
    assert(matches > 0)
    assert(sigs(0).zip(sigs(2)).count { case (x, y) => x == y } == 0)
  }
}
