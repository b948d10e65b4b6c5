package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without any Exchange (co-located join)") {
    // saveAsTable writes to the session's static warehouse dir
    // (./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a previous JVM's metastore is gone but its table dirs survive —
    // remove them or saveAsTable fails with LOCATION_ALREADY_EXISTS
    Seq("li_b", "o_b").foreach { t =>
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
    Layout.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", "l_orderkey", 8)
    // tiny test tables would be broadcast (bucketing bypassed); force the
    // sort-merge path that big fact-fact joins take at scale
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("o_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, got:\n$plan")
    assert(joined.count() ==
      li.join(o, li("l_orderkey") === o("o_orderkey")).count())
  }

  test("salted join returns the same rows as the plain join") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    val su = Tables(spark, dir, "supplier")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(su, "l_suppkey")
      .select("l_orderkey", "l_linenumber", "s_name")
    val salted = Layout.saltedJoin(li, su, "l_suppkey",
        discriminator = "l_orderkey", salts = 4)
      .select("l_orderkey", "l_linenumber", "s_name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
