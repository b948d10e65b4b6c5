package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Sessions, Tables}

/** Scratch: stage-cost breakdown of q158 (sorted-neighborhood ER). */
object SnProbeDrive {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(8, "sn-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 22).selectExpr("sum(id)").collect()
    def t(label: String)(f: => Long): Unit = {
      val s = System.nanoTime; val n = f
      println(f"SNPROBE $label%-24s ${(System.nanoTime - s) / 1e9}%.2f s  rows=$n")
    }
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 80).as("p"))
    def pass(key: Column) = {
      val ranked = d.select(col("doc_id"), key.as("k"))
        .withColumn("blk", substring(col("k"), 1, 2))
        .withColumn("rk", row_number().over(
          Window.partitionBy("blk").orderBy(col("k"), col("doc_id"))))
        .select("blk", "rk", "doc_id")
      val probes = ranked.select(col("blk"), col("doc_id").as("x_id"),
        col("rk"), explode(sequence(lit(1), lit(10))).as("off"))
        .select(col("blk"), col("x_id"), (col("rk") + col("off")).as("rk"))
      probes.join(ranked, Seq("blk", "rk"))
        .select(least(col("x_id"), col("doc_id")).as("a_id"),
          greatest(col("x_id"), col("doc_id")).as("b_id"))
    }
    (1 to 2).foreach { round =>
      println(s"SNPROBE round $round")
      val cand = pass(col("p")).union(pass(reverse(col("p")))).distinct()
      t("candidates") { cand.count() }
      val withText = cand.join(d.toDF("a_id", "pa"), "a_id")
        .join(d.toDF("b_id", "pb"), "b_id")
      t("cand+text") { withText.count() }
      t("cand+lev once") {
        withText.select(levenshtein(col("pa"), col("pb")).as("x")).count()
      }
      t("cand+lev+filter") {
        withText.select(levenshtein(col("pa"), col("pb")).as("x"))
          .filter(col("x") <= 40).count()
      }
      t("full q158") {
        graft.SparkEntry.queries("q158_sorted_neighborhood")(spark, dir)
          .count()
      }
    }
    spark.stop()
  }
}
