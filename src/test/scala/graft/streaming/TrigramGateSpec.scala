package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.ops.CurationOps

/** The perplexity gate (q94's trigram LM score) as a streaming curation
  * stage: the model trains batch-side (the materialized trigram_lm
  * artifact), scoring is a pure row-local projection, and the scaled-
  * long fold is exactly the batch frame's decimal aggregate — so the
  * gate must (a) reproduce the q94 frame row-for-row on corpus data and
  * (b) produce byte-identical output under Structured Streaming.
  */
class TrigramGateSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("row-local gate == the batch trigram frame on corpus data") {
    val model = CurationOps.trigramLmModel(spark, dir)
    val got = CurationOps.scoreTrigramLm(
        graft.engine.Tables(spark, dir, "documents"), model)
      .filter(col("n_tri").isNotNull)
      .select("doc_id", "n_tri", "mean_logp")
      .collect().map(_.toSeq).toSet
    val want = graft.SparkEntry.queries("q94_trigram_logprob")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"gate != batch frame; examples ${got.diff(want).take(3)} vs " +
        s"${want.diff(got).take(3)}")
  }

  test("streamed gate output is row-identical to the batch twin, " +
      "unseen trigrams skipped, unscorable rows null") {
    val model = CurationOps.trigramLmModel(spark, dir)
    // corpus-looking text + out-of-distribution chars + a too-short doc
    val corpus = graft.engine.Tables(spark, dir, "documents")
      .filter(col("doc_id") < 6).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val rows = corpus ++ Seq(
      (100L, "üßø çéè üßø"),
      (101L, "ab"))

    def gate(df: DataFrame): DataFrame =
      CurationOps.scoreTrigramLm(df, model)
        .select("doc_id", "n_tri", "mean_logp")

    val batch = gate(rows.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, String)](spark)
    val q = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lm_gated")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    rows.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("lm_gated").collect().map(_.toSeq).toSet

    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // the umlaut doc's trigrams are not in the (ascii) corpus model and
    // the 2-char doc has no trigram: both rows survive with null score
    Seq(100L, 101L).foreach { id =>
      val r = streamed.find(_.head == id).get
      assert(r(1) == null && r(2) == null, s"doc $id should be unscorable")
    }
    // corpus docs score exactly like the batch frame (test 1 pins the
    // full-corpus equality; here just assert they scored)
    assert(corpus.forall(c => streamed.find(_.head == c._1).get(1) != null))
  }
}
