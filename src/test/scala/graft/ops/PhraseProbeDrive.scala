package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: component timing for q160's phrase-search shape. */
object PhraseProbeDrive {
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
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.functions.VectorExpressions.register(spark)
    (1 to 3).foreach { round =>
      println(s"PROBE round $round")
      val post = t("postings_handle")(
        CurationOps.positionalPostings(spark, sfDir))
      val topLocal = t("top3_collect")(
        CurationOps.shingle3Freq(spark, sfDir)
          .orderBy(col("n").desc, col("sh")).limit(3)
          .select(col("sh")).collect().toSeq.map(_.getString(0)))
      val words = topLocal.flatMap(_.split(" ")).distinct
      t("in_scan_count")(
        post.filter(col("term").isin(words: _*)).count())
      import spark.implicits._
      val lists = post.filter(col("term").isin(words: _*))
      val top = topLocal.map { p =>
        val Array(w1, w2, w3) = p.split(" ", 3); (p, w1, w2, w3)
      }.toDF("phrase", "w1", "w2", "w3")
      def term(w: String, off: Int) =
        lists.join(broadcast(top.select(col("phrase"), col(w))),
            lists("term") === col(w))
          .select(col("phrase"), col("doc_id"),
            (col("pos") - off).as("pos"))
      t("adjacency_final")(
        term("w1", 0)
          .join(term("w2", 1), Seq("phrase", "doc_id", "pos"))
          .join(term("w3", 2), Seq("phrase", "doc_id", "pos"))
          .groupBy("phrase", "doc_id")
          .agg(count(lit(1)).as("n_occ"))
          .orderBy("phrase", "doc_id").count())
    }
    spark.stop()
  }
}
