package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The row-local `minhash_text` must be bit-identical to the
  * compositional pipeline (`shingle_strings` explode → `minhash_sig`
  * aggregate) it replaces in shuffle-free plans — same tokenization,
  * same shingle assembly, same sha256-window permutation family — and
  * to the pure-SQL formulation the DuckDB oracle runs (substr of sha2
  * hex, parsed, MIN per permutation).
  */
class MinHashTextSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("minhash_text == shingle_strings -> minhash_sig on real documents") {
    VectorExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val viaAgg = docs
      .select(col("doc_id"), expr("shingle_strings(text, 3)"))
      .groupBy("doc_id")
      .agg(expr("minhash_sig(sh, 16)").as("sig"))
    val viaRow = docs
      .select(col("doc_id"), expr("minhash_text(text, 3, 16)").as("sig"))
      .filter(col("sig").isNotNull)
    assert(viaAgg.count() == viaRow.count())
    val diff = viaAgg.toDF("doc_id", "a")
      .join(viaRow.toDF("doc_id", "b"), "doc_id")
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, s"signatures differ: ${diff.take(3).toSeq}")
  }

  test("minhash_text == the oracle's substr(sha2)-window SQL formulation") {
    VectorExpressions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val mins = (0 until 16).map { p =>
      val (digest, off) =
        if (p < 8) ("sha2(sh, 256)", p * 8 + 1)
        else ("sha2(concat('1|', sh), 256)", (p - 8) * 8 + 1)
      min(expr(s"conv(substring($digest, $off, 8), 16, 10)")
        .cast("long")).as(s"m$p")
    }
    val viaSql = docs
      .select(col("doc_id"), expr("shingle_strings(text, 3)"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(p => col(s"m$p")): _*).as("sig"))
    val viaRow = docs
      .select(col("doc_id"), expr("minhash_text(text, 3, 16)").as("sig"))
      .filter(col("sig").isNotNull)
    val diff = viaSql.toDF("doc_id", "a")
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
