package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashAggSpec extends SparkSpec {

  import spark.implicits._

  private def shingles = {
    VectorExpressions.register(spark)
    Seq(
      (1L, "alpha beta gamma"), (1L, "beta gamma delta"),
      (1L, "gamma delta eps"),
      (2L, "beta gamma delta"), (2L, "gamma delta eps"),
      (2L, "delta eps zeta"),
      (3L, "totally disjoint shingle"))
      .toDF("doc_id", "sh")
  }

  /** Reference signature via MinHashSha.fold directly. */
  private def refSig(ss: Seq[String], numPerms: Int): Seq[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    ss.foreach(s => MinHashSha.fold(s.getBytes("UTF-8"), numPerms, sig))
    sig.toSeq
  }

  test("signature = elementwise min of per-permutation sha windows") {
    val got = shingles.groupBy("doc_id")
      .agg(expr("minhash_sig(sh, 4)").as("sig"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
    val byDoc = Map(
      1L -> Seq("alpha beta gamma", "beta gamma delta", "gamma delta eps"),
      2L -> Seq("beta gamma delta", "gamma delta eps", "delta eps zeta"),
      3L -> Seq("totally disjoint shingle"))
    got.foreach { case (d, sig) =>
      assert(sig == refSig(byDoc(d), 4), s"doc $d")
    }
  }

  test("partition-order independence: repartitioned input, same signature") {
    val a = shingles.groupBy("doc_id")
      .agg(expr("minhash_sig(sh, 8)").as("sig"))
    val b = shingles.repartition(7, col("sh")).groupBy("doc_id")
      .agg(expr("minhash_sig(sh, 8)").as("sig"))
    val sa = a.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val sb = b.orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(sa == sb)
  }

  test("shared shingles give equal signature positions (LSH premise)") {
    val sigs = shingles.groupBy("doc_id")
      .agg(expr("minhash_sig(sh, 16)").as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq)
    val matches = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    // docs 1 and 2 share 2 of 4 distinct shingles → expect SOME agreement,
    // and doc 3 (disjoint) must agree nowhere with doc 1
    assert(matches > 0)
    assert(sigs(0).zip(sigs(2)).count { case (x, y) => x == y } == 0)
  }

  test("permutation values are unsigned 32-bit windows (oracle range)") {
    val sig = refSig(Seq("alpha beta gamma"), 16)
    assert(sig.forall(v => v >= 0L && v <= 0xffffffffL))
  }
}
