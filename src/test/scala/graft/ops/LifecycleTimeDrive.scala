package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch: statement-level timing for the q251 lifecycle board's
  * FRESH path (its only path — lifecycle verbs cannot warm-replay).
  * args: sfDir
  */
object LifecycleTimeDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 22).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val trace = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (trace.get()) println("TIMEQ   job stages=" +
            js.stageInfos.map(si =>
              si.name.take(60) + "#" + si.numTasks).mkString(" <- "))
        }
      })
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val r = f
      println(f"TIMEQ $tag ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        s"jobs=${jobs.get() - j0}"); r
    }
    (1 to 3).foreach { round =>
      println(s"TIMEQ -- round $round --")
      t("total") {
        graft.engine.SqlEntry.registerViews(spark, sfDir)
        val base = graft.engine.Materialize.freshKeyedPath(
          spark, "sql_mv_lifecycle", sfDir, warmReplayable = false)
        val cat = new graft.engine.StoreCatalog(base)
        t("create_tables")(Seq("lsrc1", "lsrc2").foreach(tb => cat.exec(spark,
          s"""CREATE TABLE IF NOT EXISTS $tb (
             |  o_orderstatus STRING, o_orderkey BIGINT)
             |USING graft_store""".stripMargin)))
        t("insert1")(cat.exec(spark,
          """INSERT INTO lsrc1
            |SELECT o_orderstatus, o_orderkey FROM orders
            |WHERE o_orderkey <= 1200""".stripMargin, batchId = Some(0L)))
        t("insert2")(cat.exec(spark,
          """INSERT INTO lsrc2
            |SELECT o_orderstatus, o_orderkey FROM orders
            |WHERE o_orderkey > 1200 AND o_orderkey <= 2400"""
            .stripMargin, batchId = Some(0L)))
        t("create_mv")(cat.exec(spark,
          """CREATE MATERIALIZED VIEW IF NOT EXISTS lgold AS
            |SELECT status, COUNT(*) AS cnt, SUM(k) AS total,
            |  AVG(k) AS avg_key
            |FROM (SELECT o_orderstatus AS status, o_orderkey AS k
            |      FROM lsrc1
            |      UNION ALL
            |      SELECT o_orderstatus, o_orderkey FROM lsrc2)
            |GROUP BY status""".stripMargin, batchId = Some(100L)))
        def staleOf(name: String): String = cat
          .exec(spark, "SHOW MATERIALIZED VIEWS")
          .filter(col("mvName") === name).select("stale")
          .head().getBoolean(0).toString
        t("show1")(staleOf("lgold"))
        t("insert3")(cat.exec(spark,
          """INSERT INTO lsrc2
            |SELECT o_orderstatus, o_orderkey FROM orders
            |WHERE o_orderkey > 2400 AND o_orderkey <= 3000"""
            .stripMargin, batchId = Some(1L)))
        t("show2")(staleOf("lgold"))
        t("rename")(cat.exec(spark,
          "ALTER MATERIALIZED VIEW lgold RENAME TO lgold2"))
        t("refresh") {
          trace.set(true)
          try cat.exec(spark, "REFRESH MATERIALIZED VIEW lgold2")
            .collect()
          finally trace.set(false)
        }
        t("show3")(staleOf("lgold2"))
        t("describe")(cat.exec(spark, "DESCRIBE TABLE lgold2")
          .select("col_name").collect())
        t("create_scratch")(cat.exec(spark,
          """CREATE MATERIALIZED VIEW IF NOT EXISTS lscratch AS
            |SELECT o_orderstatus, o_orderkey FROM lsrc1
            |WHERE o_orderkey > 0""".stripMargin, batchId = Some(101L)))
        t("drop_scratch")(cat.exec(spark, "DROP MATERIALIZED VIEW lscratch"))
        t("show4")(cat.exec(spark, "SHOW MATERIALIZED VIEWS").count())
        t("final_query")(cat.query(spark,
          """SELECT status, cnt, total, avg_key FROM lgold2
            |ORDER BY status""".stripMargin).count())
      }
    }
    spark.stop()
  }
}
