package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{Sessions, Tables}

/** Scratch driver: prove ShingleHashes == old posexplode+lead formulation,
  * inspect q44's plan for shuffle-free shingling + exchange reuse, and
  * confirm nothing stays persisted after a q43/q44 run.
  */
object ShingleDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "shingle-drive")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = Tables(spark, dir, "documents")

    // Old formulation, inline.
    val byDoc = Window.partitionBy("doc_id").orderBy("i")
    val old = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "i", "w")
      .select(col("doc_id"), col("w"),
        lead(col("w"), 1).over(byDoc).as("w1"),
        lead(col("w"), 2).over(byDoc).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), xxhash64(col("w"), col("w1"), col("w2")).as("h"))
    val neu = DedupOps.shingleHashes(docs)
    val oldC = old.count(); val neuC = neu.count()
    val diff = old.exceptAll(neu).count() + neu.exceptAll(old).count()
    println(s"DRIVE old=$oldC new=$neuC exceptAllDiff=$diff")

    // q44 plan: exchanges before the signature groupBy, reuse, timing.
    val q44 = graft.SparkEntry.queries("q44_minhash_lsh_candidates")
    val df = q44(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("DRIVE q44_exchanges=" + "Exchange hashpartitioning".r.findAllIn(plan).length +
      " reused=" + plan.contains("ReusedExchange"))
    val t0 = System.nanoTime()
    val n44 = df.collect().length
    println(s"DRIVE q44_rows=$n44 sec=${(System.nanoTime() - t0) / 1e9}")
    val finalPlan = df.queryExecution.executedPlan.toString
    println("DRIVE q44_final_reused=" +
      "ReusedExchange".r.findAllIn(finalPlan).length +
      " shuffles=" + "Exchange hashpartitioning".r.findAllIn(finalPlan).length +
      " isFinal=" + finalPlan.contains("isFinalPlan=true"))
    val q43 = graft.SparkEntry.queries("q43_jaccard_pairs")
    val n43 = q43(spark, dir).count()
    println(s"DRIVE q43_rows=$n43 persisted=${spark.sparkContext.getPersistentRDDs.size}")
    println(df.queryExecution.executedPlan.treeString.linesIterator
      .take(60).mkString("\n"))
    spark.stop()
  }
}
