package graft.ops
import org.apache.spark.sql.SparkSession

/** Scratch: statement-level timing for a store-DML board (q245's
  * shape) at a given SF dir. args: sfDir [warm]
  */
object StoreTimeDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val warm = args.lift(1).contains("warm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("graft.state.warm", if (warm) "1" else "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 22).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMEQ $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"TIMEQ -- round $round --")
      t("total") {
        graft.engine.SqlEntry.registerViews(spark, sfDir)
        val base = graft.engine.Materialize.freshKeyedPath(
          spark, "sql_mv_retract", sfDir)
        val cat = new graft.engine.StoreCatalog(base)
        t("create_table")(cat.exec(spark,
          """CREATE TABLE IF NOT EXISTS dsrc (
            |  o_orderstatus STRING, o_orderkey BIGINT)
            |USING graft_store""".stripMargin))
        t("insert_w0")(cat.exec(spark,
          """INSERT INTO dsrc
            |SELECT o_orderstatus, o_orderkey FROM orders
            |WHERE o_orderkey <= 1200""".stripMargin,
          batchId = Some(0L)))
        t("create_mv")(cat.exec(spark,
          """CREATE MATERIALIZED VIEW IF NOT EXISTS dgold AS
            |SELECT o_orderstatus, COUNT(*) AS cnt,
            |  SUM(o_orderkey) AS total, AVG(o_orderkey) AS avg_key
            |FROM dsrc GROUP BY o_orderstatus""".stripMargin,
          batchId = Some(100L)))
        t("insert_w1")(cat.exec(spark,
          """INSERT INTO dsrc
            |SELECT o_orderstatus, o_orderkey FROM orders
            |WHERE o_orderkey > 1200 AND o_orderkey <= 2400"""
            .stripMargin, batchId = Some(1L)))
        t("delete")(cat.exec(spark,
          "DELETE FROM dsrc WHERE o_orderkey % 2 = 1"))
        t("update")(cat.exec(spark,
          """UPDATE dsrc SET o_orderkey = o_orderkey + 1000000
            |WHERE o_orderkey % 100 = 0 AND o_orderkey <= 2400"""
            .stripMargin))
        t("refresh")(cat.exec(spark,
          "REFRESH MATERIALIZED VIEW dgold").collect())
        t("final_query")(cat.query(spark,
          """SELECT o_orderstatus, cnt, total, avg_key FROM dgold
            |ORDER BY o_orderstatus""".stripMargin).collect())
      }
    }
    spark.stop()
  }
}
