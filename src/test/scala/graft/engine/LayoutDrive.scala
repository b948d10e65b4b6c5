package graft.engine
import org.apache.spark.sql.functions._
object LayoutDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "layout-drive")
    val dir = "/root/testdata/sf0.01"
    spark.sql("DROP TABLE IF EXISTS li_d"); spark.sql("DROP TABLE IF EXISTS o_d")
    Seq("li_d", "o_d").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t))
    }
    Layout.writeBucketed(Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"), "li_d", "l_orderkey", 8)
    Layout.writeBucketed(Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey"), "o_d", "l_orderkey", 8)
    val j = spark.table("li_d").hint("merge").join(spark.table("o_d"), "l_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    println("DRIVE bucketed_rows=" + j.count() + " exchanges=" + "Exchange".r.findAllIn(plan).length + " smj=" + plan.contains("SortMergeJoin"))
    val salted = Layout.saltedJoin(
      Tables(spark, dir, "lineitem").select("l_orderkey", "l_suppkey"),
      Tables(spark, dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", "l_orderkey", 4)
    println("DRIVE salted_rows=" + salted.count())
    spark.stop()
  }
}
