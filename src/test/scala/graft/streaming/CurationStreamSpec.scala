package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.ops.CurationOps

/** The curation gate (quality floor → PII redaction) is pure row-local
  * projection/filter, so the SAME transforms must run unchanged under
  * Structured Streaming and produce byte-identical output to the batch
  * path — the property that lets a bronze→silver streaming ingest curate
  * per micro-batch instead of in a nightly rewrite.
  */
class CurationStreamSpec extends SparkSpec {

  import spark.implicits._

  private def curate(df: DataFrame): DataFrame =
    CurationOps.redactPii(CurationOps.qualityKeep(df))
      .select("doc_id", "red", "n_pii")

  test("streamed curation output is row-identical to the batch twin") {
    val rows = Seq(
      // passes quality (30+ alpha words incl. stopwords), has PII
      (1L, ("the quick brown fox jumps over a lazy dog and runs far " * 3) +
        "mail me at fox.hunter@example.com or call 415-555-0042 now then"),
      // passes quality, clean
      (2L, "the small stream flows down a green valley and of course " +
        "many quiet birds sing while the old miller walks a long path " +
        "home of evening light and wind that blows softly there"),
      // fails quality: too short
      (3L, "tiny doc"),
      // fails quality: no stopwords
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4))
    // batch twin first
    val batch = curate(rows.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, String)](spark)
    val q = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    rows.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("curated").collect().map(_.toSeq).toSet

    assert(streamed == batch, s"stream $streamed vs batch $batch")
    val kept = streamed.map(_.head.asInstanceOf[Long])
    assert(kept == Set(1L, 2L), s"quality gate kept $kept")
    val doc1 = streamed.find(_.head == 1L).get
    assert(doc1(1).asInstanceOf[String].contains("[EMAIL]") &&
      doc1(1).asInstanceOf[String].contains("[PHONE]"))
    assert(doc1(2) == 2)
  }

  test("streamed prototype classification is row-identical to the batch " +
      "twin (q111's model as a streaming gate)") {
    // The model trains batch-side (one decimal aggregate over the
    // corpus) and classification is a pure row-local projection against
    // the broadcast 1-row model — so an embedding stream can be
    // label-gated per micro-batch with the exact batch semantics.
    val dir = "/root/testdata/sf0.001"
    val model = graft.ops.SimilarityOps.prototypeModel(spark, dir)
    val sample = graft.engine.Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 40)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray))

    def classify(df: DataFrame): DataFrame =
      graft.ops.SimilarityOps.classifyByPrototype(
        df.selectExpr("vec_id",
          "transform(embedding, x -> cast(x as double)) as v"), model)
        .select("vec_id", "p_label", "dist_r")

    val batch = classify(sample.toSeq.toDF("vec_id", "embedding"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = classify(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("protogate")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    sample.grouped(15).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("protogate").collect().map(_.toSeq).toSet

    assert(streamed == batch, s"stream != batch: ${
      (streamed diff batch) ++ (batch diff streamed)}")
    assert(streamed.size == 40)
  }

  test("streamed DSIR scoring equals q109's batch aggregate exactly " +
      "(the weight table as a streaming gate)") {
    // The row-local scorer folds weights in DECIMAL over document
    // order; decimal addition is exactly associative, so it must equal
    // q109's shuffle-order groupBy sum bit-for-bit — no tolerance.
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q109_dsir_weights")(spark, dir)
      .collect().map(_.toSeq).toSet

    val model = graft.ops.CurationOps.dsirModel(spark, dir)
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)](spark)
    val q = graft.ops.CurationOps.scoreDsir(
        input.toDF().toDF("doc_id", "text"), model)
      .select("doc_id", "n_words", "dsir_logw")
      .writeStream.format("memory").queryName("dsirgate")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    docs.grouped(200).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("dsirgate").collect().map(_.toSeq).toSet

    assert(streamed == batch, s"first diffs: ${
      ((streamed diff batch) ++ (batch diff streamed)).take(4)}")
  }

  test("streamed BPE token counting equals q140's batch counts exactly " +
      "(the learned merge rules as a streaming gate)") {
    // The merge table trains batch-side (q139's vocabulary loop); the
    // N rules then fold into chained row-local replaces, so a document
    // stream gets REAL tokenizer token counts per micro-batch with zero
    // state — and must agree with the oracle-checked q140 join path.
    val dir = "/root/testdata/sf0.001"
    val merges = graft.ops.TextOps.bpeMergePairs(spark, dir)
    val batch = graft.SparkEntry.queries("q140_bpe_encode")(spark, dir)
      .select("doc_id", "n_bpe_tokens").collect().map(_.toSeq).toSet

    val docs = graft.engine.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val q = graft.ops.TextOps.bpeTokenCounts(
        input.toDF().toDF("doc_id", "text"), merges)
      .select("doc_id", "n_bpe_tokens")
      .writeStream.format("memory").queryName("bpegate")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    docs.grouped(200).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("bpegate").collect().map(_.toSeq).toSet

    assert(streamed == batch, s"first diffs: ${
      ((streamed diff batch) ++ (batch diff streamed)).take(4)}")
  }
}
