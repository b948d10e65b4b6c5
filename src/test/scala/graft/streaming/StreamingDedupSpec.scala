package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  private case class Doc(doc_id: Long, ts: Timestamp, text: String)

  private def runStream(input: MemoryStream[(Long, Timestamp, String)],
      transform: DataFrame => DataFrame, name: String,
      batches: Seq[Seq[(Long, Timestamp, String)]]): DataFrame = {
    val q = transform(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("streaming exact dedup drops byte-identical replays within the " +
      "watermark horizon") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val out = runStream(input, StreamingDedup.exactDedup(_, "2 hours"),
      "sdedup", Seq(
        Seq((1L, ts("2024-01-01 10:00:00"), "alpha beta gamma delta"),
          (2L, ts("2024-01-01 10:01:00"), "epsilon zeta eta theta")),
        // replay of doc 1's text (different id, later ts) + one new doc
        Seq((3L, ts("2024-01-01 10:30:00"), "alpha beta gamma delta"),
          (4L, ts("2024-01-01 10:31:00"), "iota kappa lambda mu"))))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(1L, 2L, 4L), s"kept $kept")
  }

  test("stream-static near-dup flags: arriving copies of corpus docs are " +
      "flagged, novel text is not") {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val index = StreamingDedup.bucketIndex(corpus)
    // a verbatim copy of corpus doc 7 must collide in EVERY band;
    // gibberish shares no shingles with anything.
    val copied = corpus.filter(col("doc_id") === 7).select("text")
      .collect().head.getString(0)
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val out = runStream(input,
      StreamingDedup.nearDupFlags(_, index), "sneardup", Seq(Seq(
        (9001L, ts("2024-01-01 10:00:00"), copied),
        (9002L, ts("2024-01-01 10:01:00"),
          "zzqx vvwy qqpr mmnk ttlj rrgh zzqx vvwy"))))
    val flagged = out.select("doc_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flagged.nonEmpty && flagged.forall(_._1 == 9001L),
      s"flags: $flagged")
    assert(flagged.exists(_._2 == 7L), s"copy of doc 7 not matched: $flagged")
  }

  /** transformWithState requires the RocksDB state store; scope to the
    * body and restore after (same shape as StatefulOpsSpec).
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

  test("bounded-state bloom dedup: cross-batch replays dropped, all " +
      "distinct texts kept at honest sizing, state fixed-size") {
    withRocksDB {
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val distinctTexts =
        corpus.map(_._2.toLowerCase.trim).distinct.length
      val input = MemoryStream[(Long, Timestamp, String)](spark)
      val rows = corpus.map { case (id, t) =>
        (id, ts("2024-01-01 10:00:00"), t) }
      // stream the corpus twice in interleaved batches: every second
      // pass is a replay the gate must drop, across batch boundaries
      val out = runStream(input,
        d => StreamingDedup.approxDedupBloom(d.drop("ts")),
        "sbloom", (rows ++ rows.map { case (id, s, t) =>
          (id + 100000L, s, t) }).toSeq.grouped(200).map(_.toSeq).toSeq)
      val kept = out.select("text").collect().map(_.getString(0))
      // no duplicate normalized text is ever emitted twice — definite
      assert(kept.map(_.toLowerCase.trim).distinct.length == kept.length)
      // at 2^20 bits / 64 buckets vs 500 docs, fp ≈ 0: all distinct
      // texts survive (a drop here means the hashing broke)
      assert(kept.map(_.toLowerCase.trim).distinct.length == distinctTexts,
        s"${kept.length} kept vs $distinctTexts distinct")
    }
  }

  test("bloom dedup under saturation stays conservative: drops occur " +
      "but emitted set is still duplicate-free") {
    withRocksDB {
      // 500 distinct docs into 2 buckets × 256 bits: heavily saturated,
      // so false-positive drops are guaranteed; the no-dup guarantee
      // must hold anyway and SOME early docs must still get through
      val input = MemoryStream[(Long, Timestamp, String)](spark)
      val rows = (0 until 500).map(i =>
        (i.toLong, ts("2024-01-01 10:00:00"), s"unique document $i body"))
      val out = runStream(input,
        d => StreamingDedup.approxDedupBloom(d.drop("ts"),
          buckets = 2, bloomBits = 256),
        "sbloomsat", rows.grouped(100).toSeq)
      val kept = out.select("text").collect().map(_.getString(0))
      assert(kept.distinct.length == kept.length)
      assert(kept.nonEmpty && kept.length < 500,
        s"expected saturation drops, kept ${kept.length}")
    }
  }

  test("composed streaming pipeline: exactDedup → nearDupFlags equals the " +
      "batch candidate join restricted to the streamed (deduped) docs") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val index = StreamingDedup.bucketIndex(corpus)
    def textOf(id: Long): String = corpus.filter(col("doc_id") === id)
      .select("text").collect().head.getString(0)
    val d3 = textOf(3); val d7 = textOf(7)
    val novel = "zzqx vvwy qqpr mmnk ttlj rrgh zzqx vvwy"
    // doc 9003 replays 9001's text inside the watermark horizon → the
    // exact tier must drop it BEFORE the near-dup join ever sees it
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val out = runStream(input,
      d => StreamingDedup.nearDupFlags(
        StreamingDedup.exactDedup(d, "2 hours"), index),
      "scomposed", Seq(
        Seq((9001L, ts("2024-01-01 10:00:00"), d7),
          (9002L, ts("2024-01-01 10:01:00"), novel)),
        Seq((9003L, ts("2024-01-01 10:30:00"), d7),
          (9004L, ts("2024-01-01 10:31:00"), d3))))
    val streamed = out.select("doc_id", "corpus_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: the SAME operators over a static frame holding the
    // exact-dedup survivors (9003's text replays 9001's → dropped)
    val survivors = Seq((9001L, d7), (9002L, novel), (9004L, d3))
      .toDF("doc_id", "text")
    val expected = StreamingDedup.nearDupFlags(survivors, index)
      .select("doc_id", "corpus_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"streaming flags $streamed != batch flags $expected")
    assert(!streamed.exists(_._1 == 9003L),
      "replayed doc leaked past the exact tier into the near-dup join")
    assert(streamed.exists { case (d, c) => d == 9001L && c == 7L })
    assert(streamed.exists { case (d, c) => d == 9004L && c == 3L })
  }

  test("streamed near-dup flags against the q133 corpus band index " +
      "agree with the batch incremental-dedup candidates") {
    import spark.implicits._
    // Same ingest boundary as q133: corpus = doc_id % 10 <> 9 (as
    // exact-dedup reps), new batch = doc_id % 10 = 9. The streaming
    // index and the batch artifact are built by the same banding, so
    // the streamed collision pairs must equal the batch index probe's
    // collision pairs, and every batch 'near' verdict (collision +
    // est >= 0.5) must be a subset of the streamed flags.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val reps = docs.filter(col("doc_id") % 10 =!= 9)
      .groupBy(col("text"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")
    val index = StreamingDedup.bucketIndex(reps)
    val newBatch = docs.filter(col("doc_id") % 10 === 9)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.nearDupFlags(
        input.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("sincdedup")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0)).start()
    newBatch.grouped(20).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("sincdedup")
      .select("doc_id", "corpus_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchPairs = StreamingDedup.nearDupFlags(
        docs.filter(col("doc_id") % 10 === 9), index)
      .select("doc_id", "corpus_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batchPairs,
      s"stream flags ${streamed.size} != batch flags ${batchPairs.size}")
    val nearVerdicts = graft.SparkEntry.queries("q133_incremental_dedup")(
        spark, dir)
      .filter(col("verdict") === "near")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nearVerdicts.subsetOf(streamed.map(_._1)),
      s"q133 near verdicts $nearVerdicts not all flagged by the stream")
  }
}
