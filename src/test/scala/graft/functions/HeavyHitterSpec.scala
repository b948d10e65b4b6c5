package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the Misra-Gries candidate sketch that the q159 oracle can't
  * exercise (the corpus's 31-word vocabulary never fills a 128-slot
  * buffer): a 50k-key stream against capacity 64 drives the decrement
  * and merge-offset paths hard, and the assertions are the two contracts
  * consumers rely on — the deterministic superset guarantee, and
  * exactness of the composed two-pass result under ANY partitioning.
  */
class HeavyHitterSpec extends SparkSpec {

  /** 10 heavy keys x 5000 occurrences + 50k singleton-tail keys,
    * deterministically interleaved (order by a hash of the row index) so
    * heavies are spread across the whole stream, not contiguous.
    */
  private def stream: DataFrame = {
    val heavy = spark.range(50000L)
      .select(concat(lit("H"), (col("id") % 10)).as("wd"),
        col("id").as(("i")))
    val tail = spark.range(50000L)
      .select(concat(lit("t"), col("id")).as("wd"),
        (col("id") + 50000L).as("i"))
    heavy.union(tail)
      .orderBy(xxhash64(col("i")))
      .select("wd")
  }

  test("sketch guarantee: every key with freq > N/(capacity+1) survives " +
      "a 50k-key adversarial stream at capacity 64") {
    graft.functions.VectorExpressions.register(spark)
    val cands = stream.repartition(16)
      .agg(expr("mg_sketch(wd, 64)").as("c"))
      .select(explode(col("c")).as("wd"))
      .collect().map(_.getString(0)).toSet
    assert(cands.size <= 64, s"capacity violated: ${cands.size}")
    // N = 100k, bound = N/65 ~ 1538; heavies have f = 5000 > bound.
    val heavies = (0 until 10).map(i => s"H$i").toSet
    val missed = heavies.diff(cands)
    assert(missed.isEmpty, s"guaranteed heavy hitters missing: $missed")
  }

  test("two-pass exact result is identical under 1, 16, and 64 " +
      "partitions (sketch noise never reaches the output)") {
    graft.functions.VectorExpressions.register(spark)
    def run(parts: Int): Seq[(String, Long)] = {
      val wds = stream.repartition(parts)
      val cand = wds.agg(expr("mg_sketch(wd, 64)").as("c"))
        .select(explode(col("c")).as("wd"))
      val total = wds.agg(count(lit(1)).as("total"))
      wds.join(broadcast(cand), "wd")
        .groupBy("wd").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .filter(col("n") * 50 > col("total")) // phi = 1/50 > 1/65
        .select(col("wd"), col("n"))
        .orderBy(col("n").desc, col("wd"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val expected = (0 until 10).map(i => (s"H$i", 5000L))
    Seq(1, 16, 64).foreach { p =>
      assert(run(p) == expected, s"partitioning $p diverged")
    }
  }

  test("analysis-time guards: non-string key and out-of-range capacity " +
      "are rejected before execution") {
    graft.functions.VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("k")
    val e1 = intercept[Exception] {
      df.agg(expr("mg_sketch(k, 8)")).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("string"))
    val sdf = Seq("a", "b").toDF("k")
    val e2 = intercept[Exception] {
      sdf.agg(expr("mg_sketch(k, 0)")).collect()
    }
    assert(e2.getMessage.contains("capacity"))
  }
}
