package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The row-local `minhash_text` must be bit-identical to the
  * compositional pipeline (`shingle_hashes` explode → `minhash_sig`
  * aggregate) it replaces in shuffle-free plans — same tokenization,
  * same shingle fold, same permutation mix.
  */
class MinHashTextSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("minhash_text == shingle_hashes -> minhash_sig on real documents") {
    VectorExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val viaAgg = docs
      .select(col("doc_id"), expr("shingle_hashes(text, 3)"))
      .groupBy("doc_id")
      .agg(expr("minhash_sig(h, 16)").as("sig"))
    val viaRow = docs
      .select(col("doc_id"), expr("minhash_text(text, 3, 16)").as("sig"))
      .filter(col("sig").isNotNull)
    assert(viaAgg.count() == viaRow.count())
    val diff = viaAgg.toDF("doc_id", "a")
      .join(viaRow.toDF("doc_id", "b"), "doc_id")
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, s"signatures differ: ${diff.take(3).toSeq}")
  }

  test("minhash_text yields null for texts with fewer than n words " +
      "(the aggregate path's dropped-doc contract) and for null input") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val got = Seq("one two", "one two three", null)
      .toDF("text")
      .select(expr("minhash_text(text, 3, 4)").as("sig"))
      .collect().map(_.isNullAt(0)).toSeq
    assert(got == Seq(true, false, true))
  }
}
