package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The row-local `simhash64` must agree bit-for-bit with the relational
  * formulation the q92 oracle runs (explode words → sha2 hex → 64
  * SUM(CASE digit >= '8') votes → per-16-bit-word packing).
  */
class SimHash64Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("simhash64 == explode + 64 sum(CASE) aggregate formulation") {
    VectorExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val bitSums = (0 until 64).map(k =>
      sum(when(substring(col("h"), k + 1, 1) >= "8", 1).otherwise(-1))
        .as(s"s$k"))
    val packs = (0 until 4).map { j =>
      (0 until 16).map(k =>
        when(col(s"s${16 * j + k}") > 0, 1 << k).otherwise(0))
        .reduce(_ + _).cast("long").as(s"b$j")
    }
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), sha2(col("w"), 256).as("h"))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id") +: packs: _*)
      .select(col("doc_id"), array(col("b0"), col("b1"), col("b2"),
        col("b3")).as("f"))
    val viaRow = docs
      .select(col("doc_id"), expr("simhash64(text)").as("f"))
    val diff = viaAgg.toDF("doc_id", "a")
      .join(viaRow.toDF("doc_id", "b"), "doc_id")
      .filter(col("a") =!= col("b"))
    assert(viaAgg.count() == viaRow.count())
    assert(diff.isEmpty, s"fingerprints differ: ${diff.take(3).toSeq}")
  }

  test("identical texts share fingerprints; null yields null") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val f = Seq("same words here", "same words here", null)
      .toDF("text").select(expr("simhash64(text)").as("f")).collect()
    assert(f(0).getSeq[Long](0) == f(1).getSeq[Long](0))
    assert(f(2).isNullAt(0))
  }
}
