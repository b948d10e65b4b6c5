package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measure LSH containment coverage by jaccard stratum per SF. */
object CovDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val t0 = System.nanoTime()
      val rows = DedupOps
        .lshContainment(spark, s"/root/testdata/$sf", minJaccard = 0.7)
        .groupBy((col("jaccard") >= 0.9).as("ge09"))
        .agg(count(lit(1)).as("n"),
          sum(col("covered").cast("int")).as("n_cov"))
        .collect()
      println(s"COV $sf ${(System.nanoTime() - t0) / 1e9} s: " +
        rows.map(r => s"ge09=${r.getBoolean(0)} n=${r.getLong(1)} cov=${r.getLong(2)}").mkString(" | "))
    }
    spark.stop()
  }
}
