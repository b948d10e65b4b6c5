package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** Accuracy bounds for the sketch-based aggregates, against their exact
  * oracle-checked twins — the same pattern DedupQualitySpec applies to
  * the LSH/IVF paths, so NO approximate operator ships unasserted.
  * Sketches are deterministic for a fixed input/partitioning, so these
  * are stable assertions.
  */
class ApproxQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (q26) within 5% of exact count-distinct " +
      "(q15) per group") {
    val li = Tables(spark, dir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"HLL rel-err $relErr for ${r.getString(0)}: $approx vs $exact")
    }
  }

  test("quantized search (q74) keeps recall@10 >= 0.9 against the exact " +
      "top-k (q51) per query") {
    import graft.SparkEntry
    def pairs(name: String) = SparkEntry.queries(name)(spark, dir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q51_cosine_topk")
    val quant = pairs("q74_quantized_search")
    val perQuery = exact.groupBy(_._1).map { case (q, ps) =>
      q -> ps.count(quant.contains).toDouble / ps.size }
    perQuery.foreach { case (q, recall) =>
      assert(recall >= 0.9, s"recall@10 for query $q: $recall")
    }
  }

  test("approx_percentile (q66) within 1% of exact percentile (q59) " +
      "per group and quantile") {
    val li = Tables(spark, dir, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("exact"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
          .as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getSeq[Double](1)
      val approx = r.getSeq[Double](2)
      exact.lazyZip(approx).foreach { (e, a) =>
        val relErr = math.abs(a - e) / e
        assert(relErr <= 0.01,
          s"sketch rel-err $relErr for ${r.getString(0)}: $a vs $e")
      }
    }
  }
}
