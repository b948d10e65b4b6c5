package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The char_ngrams generator must emit exactly the substring sequence the
  * HOF formulation defines (it exists only as that formulation's codegen-
  * friendly replacement), including multi-byte and short-input edges.
  */
class CharNgramsSpec extends SparkSpec {

  import spark.implicits._

  test("char_ngrams(text, 3) equals the transform(sequence) formulation") {
    VectorExpressions.register(spark)
    val docs = Seq(
      (1L, "abcdef"),
      (2L, "ab"),            // shorter than n → no rows
      (3L, "abc"),           // exactly n → one row
      (4L, "héllo wörld"),   // multi-byte chars count as ONE char
      (5L, "aaaa")).toDF("doc_id", "text")
    val gen = docs
      .select(col("doc_id"), expr("char_ngrams(text, 3)"))
      .toDF("doc_id", "pos", "t")
    val hof = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, length(text) - 2), " +
          "i -> substring(text, i, 3))")))
      .toDF("doc_id", "p0", "t")
      .select(col("doc_id"), (col("p0") + 1).cast("int").as("pos"), col("t"))
    assert(gen.orderBy("doc_id", "pos").collect().toSeq ==
      hof.orderBy("doc_id", "pos").collect().toSeq)
    assert(gen.filter(col("doc_id") === 2).isEmpty)
    assert(gen.filter(col("doc_id") === 4).count() === 9)
  }
}
