package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.ops.CurationOps

/** The PRODUCTION composition: every stream-safe curation gate chained
  * in ONE readStream pipeline — bounded-state bloom dedup → trigram
  * perplexity gate → DSIR importance scoring → quality floor — asserted
  * row-identical to the batch twin on the composed output (the per-gate
  * specs pin each stage; this pins their composition, which is the shape
  * a bronze→silver streaming ingest actually runs). The models (trigram
  * LM, DSIR weights) train batch-side from the corpus artifacts and ship
  * as literals; every gate after the dedup is a row-local
  * projection/filter, so composing them adds no state beyond the bloom's
  * fixed buckets×bits.
  */
class CurationPipelineStreamSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** transformWithState requires the RocksDB state store; scope to the
    * body and restore after (same shape as StreamingDedupSpec).
    */
  private def withRocksDB[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("composed streaming curation (bloom dedup -> perplexity -> DSIR " +
      "-> quality -> BPE token pricing) is row-identical to the batch " +
      "twin") {
    withRocksDB {
      val lm = CurationOps.trigramLmModel(spark, dir)
      val dsir = CurationOps.dsirModel(spark, dir)
      val merges = graft.ops.TextOps.bpeMergePairs(spark, dir)

      // Gates AFTER dedup — shared verbatim by the streaming pipeline
      // and the batch twin (all row-local, so they compose unchanged;
      // the BPE stage prices every survivor in real tokenizer tokens).
      def gates(df: DataFrame): DataFrame =
        graft.ops.TextOps.bpeTokenCounts(
          CurationOps.qualityKeep(
            CurationOps.scoreDsir(
              CurationOps.scoreTrigramLm(df, lm)
                .filter(col("mean_logp") >= -2.0), dsir)), merges)
          .select("doc_id", "text", "n_tri", "mean_logp",
            "n_words", "dsir_logw", "n_bpe_tokens")

      val corpus = graft.engine.Tables(spark, dir, "documents")
        .filter(col("doc_id") < 8).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      // batch 1: eight corpus docs (1,2,3,5,6,7 pass the quality floor;
      // 0 and 4 fail it — too few words / stopwords). batch 2: a replay
      // of doc 1's text (dedup must drop it BEFORE any gate sees it),
      // an out-of-distribution doc (unscorable -> null -> perplexity
      // gate drops), and a short doc (scores fine, quality floor drops).
      val batch2 = Seq(
        (900L, corpus.find(_._1 == 1L).get._2),
        (901L, "üßø çéè üßø çéè üßø çéè üßø çéè"),
        (902L, "the tiny doc of a and"))

      val input = MemoryStream[(Long, String)](spark)
      val q = gates(StreamingDedup.approxDedupBloom(
          input.toDF().toDF("doc_id", "text")))
        .writeStream.format("memory").queryName("curation_pipeline")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.ProcessingTime(0)).start()
      Seq(corpus, batch2).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      q.stop()
      val streamed = spark.table("curation_pipeline")
        .collect().map(_.toSeq).toSet

      // Batch twin: exact keep-first dedup (== the bloom gate here:
      // duplicates arrive in later micro-batches with higher ids and
      // fp ~ 0 at the default sizing) then the same gate chain.
      val w = Window.partitionBy(lower(trim(col("text"))))
        .orderBy(col("doc_id"))
      val batchTwin = gates(
        (corpus ++ batch2).toDF("doc_id", "text")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn"))
        .collect().map(_.toSeq).toSet

      assert(streamed == batchTwin,
        s"stream ${streamed.map(_.head)} vs batch ${batchTwin.map(_.head)}")
      val kept = streamed.map(_.head.asInstanceOf[Long])
      assert(kept == Set(1L, 2L, 3L, 5L, 6L, 7L), s"kept $kept")
      // every survivor carries both scores and a real token price —
      // the DSIR and BPE stages really ran
      assert(streamed.forall(r => r(3) != null && r(5) != null &&
        r(6).asInstanceOf[Long] >= r(4).asInstanceOf[Long]))
    }
  }
}
