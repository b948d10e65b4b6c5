package graft.ops

import org.apache.spark.sql.functions._

import graft.engine.{Sessions, Tables}

/** Scratch driver: sweep (numTables, bitsPerTable) for annLsh and print
  * recall@10 vs the exact top-k plus candidate-set size — the data for
  * picking q53's registered operating point.
  */
object AnnTuneDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "ann-tune")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.functions.VectorExpressions.register(spark)
    val vecs = Tables(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding").as("v"),
      expr("sqrt(vec_dot(embedding, embedding))").as("nv")).cache()
    val n = vecs.count()
    val exact = SimilarityOps.cosineTopK(spark, dir)
      .select("q_id", "vec_id", "cos_r").cache()
    val ex = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println("TUNE exact cos_r per q: " + exact.orderBy("q_id", "cos_r")
      .groupBy("q_id").agg(min("cos_r"), max("cos_r")).collect().mkString(" "))
    for ((t, b) <- Seq((4, 8), (8, 8), (8, 4), (16, 4), (16, 6), (8, 6), (32, 8), (16, 8))) {
      val ann = SimilarityOps.annLsh(vecs, t, b, 0 until 5, 10)
        .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // candidate count before top-k: rerun without the rank filter is
      // annoying; approximate with the bucket-join pair count.
      val bucketed = vecs.select(col("vec_id"), posexplode(
        expr(s"vec_hp_buckets(v, $t, $b)"))).toDF("vec_id", "tt", "bkt")
      val q = bucketed.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("tt"), col("bkt"))
      val cands = bucketed.join(broadcast(q), Seq("tt", "bkt"))
        .filter(col("vec_id") =!= col("q_id"))
        .select("q_id", "vec_id").distinct().count()
      val recall = ex.count(ann.contains).toDouble / ex.size
      println(f"TUNE t=$t%2d b=$b%2d recall@10=$recall%.2f candidates=$cands (of ${5 * (n - 1)})")
    }
    spark.stop()
  }
}
