package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Streaming deduplication for a document STREAM — the incremental form
  * of the batch dedup pipeline (DedupOps), enabled by the row-local
  * `minhash_text` signature: a streaming SELECT can compute full MinHash
  * signatures per arriving document with no stateful aggregation, so the
  * only state anywhere is what the dedup semantics themselves require.
  *
  * Two tiers, mirroring the batch pipeline's order:
  *
  *  1. [[exactDedup]] — drop byte-identical replays within the watermark
  *     horizon (state: one 32-byte hash per doc per horizon, bounded).
  *  2. [[nearDupFlags]] — flag arriving docs whose MinHash-LSH band
  *     buckets collide with a STATIC corpus index (stream-static join:
  *     stateless on the stream side; the index is the batch-built bucket
  *     table, re-read per micro-batch so a nightly rebuild is picked up
  *     without restarting the query). This is streaming benchmark
  *     decontamination / "have we already trained on this" filtering.
  *
  * Stream-stream near-dup (new docs vs other new docs) is deliberately
  * NOT offered as a continuous query: candidate generation needs
  * bucket-grouping state over the full history, which is a batch job's
  * shape (run q44/q49 over the landed table per period instead —
  * exactly how production training-data pipelines schedule it).
  */
object StreamingDedup {

  /** Exact dedup on normalized content within the watermark horizon.
    * Input needs an event-time column `ts` and a `text` column; output
    * is the input with replays of the same normalized text dropped.
    */
  def exactDedup(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", sha2(lower(trim(col("text"))), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Static LSH bucket index of a reference corpus: one row per
    * (corpus_id, band, bh). Build in batch (e.g. nightly over the landed
    * corpus), write to a table partitioned/bucketed by (band, bh) so the
    * streaming join prunes.
    */
  def bucketIndex(corpus: DataFrame, numPerms: Int = 16,
      bands: Int = 4): DataFrame =
    DedupOps.bandBuckets(
        DedupOps.minhashSigs(corpus, numPerms).select("doc_id", "sig"),
        numPerms, bands)
      .select(col("doc_id").as("corpus_id"), col("band"), col("bh"))

  /** Flag streaming docs whose band buckets collide with the static
    * index: emits one row per (doc, matching corpus doc) with the band
    * that collided — the near-dup candidate stream. Stateless on the
    * stream side (project + explode + stream-static equi-join); a doc
    * colliding with the same corpus doc in several bands emits several
    * rows (dedup per micro-batch downstream if needed — keeping the
    * join stateless is worth the at-least-once flag semantics).
    */
  def nearDupFlags(docs: DataFrame, index: DataFrame, numPerms: Int = 16,
      bands: Int = 4): DataFrame = {
    val sigs = DedupOps.minhashSigs(docs, numPerms)
    DedupOps.bandBuckets(sigs, numPerms, bands)
      .join(index, Seq("band", "bh"))
      .select(col("doc_id"), col("corpus_id"), col("band"))
  }

  /** A hashed streaming document: normalized-content hashes computed
    * row-locally in the scan's project (codegen'd xxhash64), so the
    * stateful operator never touches text bytes for dedup decisions.
    */
  final case class HashedDoc(doc_id: Long, text: String, bucket: Int,
      h1: Long, h2: Long)

  /** Approximate exact-dedup with BOUNDED state: one fixed-size bloom
    * filter per key bucket (`transformWithState` + RocksDB), instead of
    * one state row per distinct document. [[exactDedup]]'s state grows
    * with distinct documents per watermark horizon — at 100 TB/day that
    * growth is the streaming job's memory bill and the reason horizons
    * get shortened; this gate's state is `buckets × bloomBits/8` bytes,
    * FIXED, for an unbounded horizon. The trade: a bloom false positive
    * silently drops a genuinely-new document (rate ≈ (1-e^(-kn/m))^k
    * for n docs per bucket — size `bloomBits` at ~15 bits per expected
    * doc for ~1e-4), while "unseen" is definite, so no duplicate
    * normalized text is ever emitted twice for the life of the query.
    * Dropping ~1e-4 of unique docs is the accepted cost of this shape
    * in production dedup (crawler URL-seen tests, CCNet's hash-sharded
    * paragraph dedup).
    *
    * Positions use Kirsch–Mitzenmacher double hashing (pos_i = h1 +
    * i·h2 mod m) over two independent xxhash64s of the normalized text;
    * build and probe are the same JVM code, so there is no cross-engine
    * hash-parity concern. Bucketing by h1 means every duplicate of a
    * text lands in the same state partition — the no-duplicate
    * guarantee needs no cross-key coordination.
    */
  def approxDedupBloom(docs: DataFrame, buckets: Int = 64,
      bloomBits: Int = 1 << 20): DataFrame = {
    require(buckets > 0 && bloomBits >= 8 && bloomBits % 8 == 0,
      s"need buckets > 0 and bloomBits a positive multiple of 8, " +
        s"got ($buckets, $bloomBits)")
    val s = docs.sparkSession
    import s.implicits._
    val norm = lower(trim(col("text")))
    docs.select(col("doc_id"), col("text"),
        pmod(xxhash64(norm), lit(buckets.toLong)).cast("int").as("bucket"),
        xxhash64(norm).as("h1"),
        xxhash64(lit(0x9E3779B9L), norm).as("h2"))
      .as[HashedDoc]
      .groupByKey(_.bucket)
      .transformWithState(new BloomDedupProcessor(bloomBits),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .select("doc_id", "text")
  }

  /** Per-bucket bloom state: probe-then-set per arriving row, one state
    * write per (bucket, batch). k = 7 probes.
    */
  final class BloomDedupProcessor(bloomBits: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Int, HashedDoc, HashedDoc] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode,
      TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    private val K = 7

    @transient private var bloom: ValueState[Array[Byte]] = _

    override def init(om: OutputMode, tm: TimeMode): Unit =
      bloom = getHandle.getValueState("bloom", Encoders.BINARY,
        TTLConfig.NONE)

    private def pos(d: HashedDoc, i: Int): Int = {
      val m = bloomBits.toLong
      val p = (d.h1 + i.toLong * d.h2) % m
      ((p + m) % m).toInt
    }
    private def seen(b: Array[Byte], d: HashedDoc): Boolean =
      (0 until K).forall { i =>
        val p = pos(d, i); (b(p >> 3) & (1 << (p & 7))) != 0
      }
    private def set(b: Array[Byte], d: HashedDoc): Unit =
      (0 until K).foreach { i =>
        val p = pos(d, i)
        b(p >> 3) = (b(p >> 3) | (1 << (p & 7))).toByte
      }

    override def handleInputRows(key: Int, rows: Iterator[HashedDoc],
        tv: TimerValues): Iterator[HashedDoc] = {
      val bytes =
        if (bloom.exists()) bloom.get() else new Array[Byte](bloomBits / 8)
      var changed = false
      // materialize before the state write: the returned iterator is
      // consumed after handleInputRows returns
      val out = rows.filter { d =>
        val fresh = !seen(bytes, d)
        if (fresh) { set(bytes, d); changed = true }
        fresh
      }.toVector
      if (changed) bloom.update(bytes)
      out.iterator
    }
  }
}
