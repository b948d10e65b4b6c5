package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.engine.Tables
import graft.engine.Pin.Pinnable

/** Multimodal columns: image/audio/video treated as opaque `binary`
  * payloads with typed metadata, exactly as a 100 TB training-data lake
  * stores them. The Spark-side plumbing — schema, per-partition batch
  * processing, explode of frame samples — is real and tested; the actual
  * media decode is STUBBED with a deterministic fake (`StubCodec`) because
  * no image/audio libraries exist in this environment. Swapping in a real
  * codec changes one function, not the pipeline.
  *
  * Scale notes: decode runs in `mapPartitions` so a real codec would amortize
  * per-partition init (model load, JNI handles) across rows — the Scala
  * analog of a Pandas-UDF batch. Payloads stay off the driver; frame
  * sampling is a generator-style explode, so output size is controlled by
  * `fps`-like parameters rather than input size.
  */
object MultimodalOps {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("n_bytes", LongType))))))

  /** Deterministic synthetic media table derived from `documents` (the
    * driver ships no binary fixtures): payload = utf8 text bytes, kind
    * cycles by id. Deterministic → oracle-checkable plumbing.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(col("source").as("source"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  // ---- STUB CODEC ----------------------------------------------------
  // Stands in for image/audio decoding (???-equivalent): produces
  // deterministic pseudo-features from payload bytes. A real
  // implementation would decode pixels/samples here.
  object StubCodec {
    /** Fake "decode": (width, height, channels) derived from byte stats. */
    def imageDims(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (32 + n % 224, 32 + (n / 7) % 224, 3)
    }
    /** Fake feature vector: 8 byte-histogram buckets, L1-normalized. */
    def features(payload: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](8)
      payload.foreach(b => hist((b & 0xff) / 32) += 1.0)
      val total = math.max(1.0, hist.sum)
      hist.map(_ / total)
    }
    /** Fake frame timestamps: one per 64 bytes, up to `maxFrames`. */
    def frameOffsetsMs(payload: Array[Byte], maxFrames: Int): Seq[Long] =
      (0 until math.min(maxFrames, math.max(1, payload.length / 64)))
        .map(_ * 1000L)
    /** Fake "resize" to a byte budget: deterministic stride subsample —
      * a real codec would decode, scale, re-encode here.
      */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
      if (payload.length <= targetBytes) return payload
      val stride = math.max(1, payload.length / targetBytes)
      payload.indices.by(stride).take(targetBytes)
        .map(payload).toArray
    }
  }
  // --------------------------------------------------------------------

  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
      height: Int, channels: Int, n_bytes: Long, features: Array[Double])

  /** Per-partition batch decode → typed features. The partition iterator
    * is the batch boundary (init-once-per-partition for a real codec).
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: open decoder context here, once per partition
        rows.map { case (id, kind, payload) =>
          val (w, h, c) = StubCodec.imageDims(payload)
          MediaFeatures(id, kind, w, h, c, payload.length.toLong,
            StubCodec.features(payload))
        }
      }
  }

  /** Resize every payload to a byte budget, keeping schema + metadata
    * shape (n_bytes updated): the thumbnail/downsample pass a training
    * pipeline runs before feature extraction. Same mapPartitions batch
    * boundary as [[decodeFeatures]] for per-partition codec init.
    */
  def resizePayloads(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "meta.source")
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload, source) =>
          val resized = StubCodec.resize(payload, targetBytes)
          (id, kind, resized, source, resized.length.toLong)
        }
      }
      .toDF("media_id", "kind", "payload", "source", "n_bytes")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("source"), col("n_bytes")).as("meta"))
  }

  /** Frame sampling for video rows: one output row per sampled frame. */
  def sampleFrames(media: DataFrame, maxFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = media.filter(col("kind") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        StubCodec.frameOffsetsMs(payload, maxFrames).zipWithIndex.map {
          case (off, i) => (id, i, off, payload.length.toLong)
        }
      }
    frames.toDF("media_id", "frame_idx", "offset_ms", "n_bytes")
  }

  val defs: Seq[QueryDef] = Seq(

    // Binary-column plumbing parity: byte lengths + content hash over the
    // binary payload (sha2 over utf8 bytes ≡ DuckDB's string sha256).
    QueryDef(
      "q60_multimodal_meta",
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS payload_sha,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      mediaTable(s, dir).select(
        col("media_id"),
        col("meta.n_bytes").as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
        col("kind"))
        .orderBy("media_id")
    },

    // Decode + aggregate: typed feature pipeline exercised end-to-end.
    // The Spark side runs the REAL plumbing (typed Dataset through
    // mapPartitions, where a production codec would decode); the oracle
    // reproduces the stub codec's arithmetic (width = 32 + n_bytes % 224
    // over utf8 payload bytes), so the whole decode→aggregate path is
    // hash-checked. Swapping in a real codec retires the oracle back to
    // rows-only — the plumbing contract it pins stays identical.
    QueryDef(
      "q61_multimodal_features",
      """WITH m AS (SELECT
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS nb
        |  FROM documents)
        |SELECT kind, COUNT(*) AS n,
        |  avg(CAST(32 + nb % 224 AS DOUBLE)) AS avg_width,
        |  CAST(SUM(nb) AS BIGINT) AS total_bytes
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
      decodeFeatures(mediaTable(s, dir))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), avg(col("width")).as("avg_width"),
          sum(col("n_bytes")).as("total_bytes"))
        .orderBy("kind")
    },

    // Frame sampling explode (generator shape). Same contract as q61:
    // real flatMap plumbing on the Spark side, oracle reproducing the
    // stub's frame count (one per 64 payload bytes, capped at 4, offsets
    // i*1000 ms) so the generator's fan-out is hash-checked.
    QueryDef(
      "q62_multimodal_frames",
      """SELECT doc_id AS media_id,
        |  CAST(least(4, greatest(1, octet_length(encode(text)) // 64))
        |    AS BIGINT) AS n_frames,
        |  CAST((least(4, greatest(1, octet_length(encode(text)) // 64)) - 1)
        |    * 1000 AS BIGINT) AS last_ms
        |FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      sampleFrames(mediaTable(s, dir))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), max(col("offset_ms")).as("last_ms"))
        .orderBy("media_id")
    },

    // Perceptual-hash image near-dup — the image-modality twin of q92's
    // text SimHash, composed THROUGH the decode path: a 64-bit
    // difference-hash per image computed inside the same mapPartitions
    // batch boundary a real decoder runs in, carried as four 16-bit
    // words, banded 4×16 (2¹⁶ keys per band — the scale-safe point q92
    // established; by pigeonhole every pair within hamming 3 shares an
    // intact band), pairs histogrammed by hamming distance. The stub
    // sketch is dHash over a 64-bin byte-BIGRAM hash histogram (bucket
    // = (b₁·131 + b₂) mod 64; bit k = bucket k count > bucket (k+17)
    // mod 64 count — all-integer, exact in any engine): plain
    // byte-value bucketing is DEGENERATE on a ~27-symbol text alphabet
    // (dead buckets → single-key bands → the band join collapses
    // toward all-pairs, the exact quadratic the round-5 verdict
    // killed), while bigram hashing spreads all 64 buckets and the
    // stride-17 comparison decorrelates bits within a band (measured
    // 75-99 distinct keys per band at sf0.01 vs 1 for byte-value
    // bucketing, candidates 8% of all-pairs). A real codec would dHash
    // decoded PIXEL gradients — near-uniform bits by construction; the
    // banding, probing, and histogram downstream are codec-agnostic,
    // and the stub's arithmetic keeps the whole path oracle-checkable
    // (ASCII corpus → DuckDB codepoints ARE the payload bytes).
    QueryDef(
      "q134_media_phash_neardup", {
        val keyCase = (0 until 4).map(j =>
          s"WHEN $j THEN b$j").mkString("CASE j ", " ", " END")
        val ham = (0 until 4).map(j =>
          s"bit_count(xor(a.b$j, b.b$j))").mkString(" + ")
        val packs = (0 until 4).map(j =>
          s"MAX(CASE WHEN j = $j THEN w END) AS b$j")
          .mkString(",\n        |    ")
        s"""WITH img AS (SELECT doc_id, text FROM documents
           |  WHERE CAST(doc_id % 3 AS INTEGER) = 0),
           |bg AS (SELECT doc_id, (ascii(substr(text, i, 1)) * 131
           |    + ascii(substr(text, i + 1, 1))) % 64 AS bkt
           |  FROM img, unnest(range(1, length(text))) AS t(i)),
           |hist AS (SELECT doc_id, bkt, COUNT(*) AS cnt FROM bg
           |  GROUP BY 1, 2),
           |grid AS (SELECT doc_id, k FROM img,
           |  (SELECT unnest(range(0, 64)) AS k)),
           |dense AS (SELECT g.doc_id, g.k, COALESCE(h.cnt, 0) AS c
           |  FROM grid g LEFT JOIN hist h
           |    ON h.doc_id = g.doc_id AND h.bkt = g.k),
           |bits AS (SELECT a.doc_id, a.k,
           |    CASE WHEN a.c > b.c THEN 1 ELSE 0 END AS bit
           |  FROM dense a JOIN dense b
           |    ON b.doc_id = a.doc_id AND b.k = (a.k + 17) % 64),
           |words AS (SELECT doc_id, k // 16 AS j,
           |    CAST(SUM(bit * (1 << (k % 16))) AS BIGINT) AS w
           |  FROM bits GROUP BY 1, 2),
           |f AS (SELECT doc_id,
           |    $packs
           |  FROM words GROUP BY doc_id),
           |bands AS (SELECT doc_id, b0, b1, b2, b3, j, $keyCase AS key
           |  FROM f, (SELECT unnest(range(0, 4)) AS j)),
           |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           |    $ham AS hamming
           |  FROM bands a JOIN bands b
           |    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id)
           |SELECT CAST(hamming AS INTEGER) AS hamming,
           |  COUNT(*) AS n_pairs
           |FROM cand WHERE hamming <= 3 GROUP BY hamming
           |ORDER BY hamming""".stripMargin
      }) { (s, dir) =>
      phashBandPairs(s, dir)
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("hamming").cast("int").as("hamming"), col("n_pairs"))
        .orderBy("hamming")
    },

    // Cross-modal consistency audit: for every near-duplicate IMAGE
    // pair (q134's banded-hamming candidates), the word-Jaccard of the
    // two documents' TEXTS — near-identical images with divergent
    // captions flag caption noise or image reuse; consistent pairs
    // confirm the modalities agree. The pair space is q134's
    // (band-bounded, tiny); the text side joins the pairs against the
    // distinct (doc, word) frame — per-pair work is two word-set
    // probes, never a text×text scan.
    QueryDef(
      "q150_caption_consistency", {
        val keyCase = (0 until 4).map(j =>
          s"WHEN $j THEN b$j").mkString("CASE j ", " ", " END")
        val ham = (0 until 4).map(j =>
          s"bit_count(xor(a.b$j, b.b$j))").mkString(" + ")
        val packs = (0 until 4).map(j =>
          s"MAX(CASE WHEN j = $j THEN w END) AS b$j")
          .mkString(",\n        |    ")
        s"""WITH img AS (SELECT doc_id, text FROM documents
           |  WHERE CAST(doc_id % 3 AS INTEGER) = 0),
           |bg AS (SELECT doc_id, (ascii(substr(text, i, 1)) * 131
           |    + ascii(substr(text, i + 1, 1))) % 64 AS bkt
           |  FROM img, unnest(range(1, length(text))) AS t(i)),
           |hist AS (SELECT doc_id, bkt, COUNT(*) AS cnt FROM bg
           |  GROUP BY 1, 2),
           |grid AS (SELECT doc_id, k FROM img,
           |  (SELECT unnest(range(0, 64)) AS k)),
           |dense AS (SELECT g.doc_id, g.k, COALESCE(h.cnt, 0) AS c
           |  FROM grid g LEFT JOIN hist h
           |    ON h.doc_id = g.doc_id AND h.bkt = g.k),
           |bits AS (SELECT a.doc_id, a.k,
           |    CASE WHEN a.c > b.c THEN 1 ELSE 0 END AS bit
           |  FROM dense a JOIN dense b
           |    ON b.doc_id = a.doc_id AND b.k = (a.k + 17) % 64),
           |words AS (SELECT doc_id, k // 16 AS j,
           |    CAST(SUM(bit * (1 << (k % 16))) AS BIGINT) AS w
           |  FROM bits GROUP BY 1, 2),
           |f AS (SELECT doc_id,
           |    $packs
           |  FROM words GROUP BY doc_id),
           |bands AS (SELECT doc_id, b0, b1, b2, b3, j, $keyCase AS key
           |  FROM f, (SELECT unnest(range(0, 4)) AS j)),
           |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           |    $ham AS hamming
           |  FROM bands a JOIN bands b
           |    ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id),
           |pairs AS (SELECT a_id, b_id, CAST(hamming AS INTEGER)
           |    AS hamming FROM cand WHERE hamming <= 3),
           |dw AS (SELECT DISTINCT doc_id, wd FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS wd
           |    FROM img) t WHERE wd <> ''),
           |sz AS (SELECT doc_id, COUNT(*) AS n FROM dw GROUP BY doc_id),
           |inter AS (SELECT p.a_id, p.b_id, COUNT(*) AS ni
           |  FROM pairs p JOIN dw da ON da.doc_id = p.a_id
           |  JOIN dw db ON db.doc_id = p.b_id AND db.wd = da.wd
           |  GROUP BY p.a_id, p.b_id)
           |SELECT p.a_id, p.b_id, p.hamming,
           |  floor(COALESCE(i.ni, 0)
           |    / CAST(sa.n + sb.n - COALESCE(i.ni, 0) AS DOUBLE)
           |    * 1000000) / 1000000.0 AS jacc,
           |  COALESCE(i.ni, 0)
           |    / CAST(sa.n + sb.n - COALESCE(i.ni, 0) AS DOUBLE)
           |    >= 0.5 AS consistent
           |FROM pairs p
           |JOIN sz sa ON sa.doc_id = p.a_id
           |JOIN sz sb ON sb.doc_id = p.b_id
           |LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
           |ORDER BY p.a_id, p.b_id""".stripMargin
      }) { (s, dir) =>
      val pairs = phashBandPairs(s, dir)
        .select(col("a_id"), col("b_id"),
          col("hamming").cast("int").as("hamming"))
        .pinned
      val dw = Tables(s, dir, "documents")
        .filter(expr("cast(doc_id % 3 as int) = 0"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("wd"))
        .filter(col("wd") =!= "").distinct()
      val sz = dw.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(dw.toDF("a_id", "wd"), "a_id")
        .join(dw.toDF("b_id", "wd"), Seq("b_id", "wd"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("ni"))
      val jacc = coalesce(col("ni"), lit(0L)) /
        (col("na") + col("nb") - coalesce(col("ni"), lit(0L)))
          .cast("double")
      pairs
        .join(sz.toDF("a_id", "na"), "a_id")
        .join(sz.toDF("b_id", "nb"), "b_id")
        .join(inter, Seq("a_id", "b_id"), "left")
        .select(col("a_id"), col("b_id"), col("hamming"),
          (floor(jacc * 1000000) / 1000000.0).as("jacc"),
          (jacc >= 0.5).as("consistent"))
        .orderBy("a_id", "b_id")
    })

  /** q134's banded-hamming candidate pairs `(a_id, b_id, hamming)` over
    * the image tier — 4×16-bit bands (q92's scale-safe shape), hamming
    * verified ≤ 3 only on band-colliding pairs. Shared by q134 (the
    * distance histogram) and q150 (the cross-modal consistency audit).
    */
  private def phashBandPairs(s: SparkSession, dir: String): DataFrame = {
    val bands = phashes(
        mediaTable(s, dir).filter(col("kind") === "image"))
      .toDF()
      .select(col("media_id"), array(col("b0"), col("b1"), col("b2"),
        col("b3")).as("f"))
      .select(col("media_id"), col("f"),
        posexplode(col("f")).as(Seq("j", "key")))
      .repartition(col("media_id"))
    val ham = (0 until 4).map(j =>
      expr(s"bit_count(element_at(fa, ${j + 1}) ^ " +
        s"element_at(fb, ${j + 1}))")).reduce(_ + _)
    bands.toDF("a_id", "fa", "j", "key")
      .join(bands.toDF("b_id", "fb", "j", "key"), Seq("j", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), ham.as("hamming")).distinct()
      .filter(col("hamming") <= 3)
  }

  final case class MediaPhash(media_id: Long, b0: Long, b1: Long,
      b2: Long, b3: Long)

  /** 64-bit perceptual hash per payload as four 16-bit words, computed
    * in the [[decodeFeatures]]-style per-partition batch (a real codec
    * decodes pixels and dHashes gradients; the stub dHashes a 64-bin
    * byte-bigram hash histogram — bucket (b₁·131 + b₂) mod 64, bit k
    * set iff count(k) > count((k+17) mod 64), all-integer and so exact
    * in any engine — see the q134 scaladoc for why plain byte-value
    * bucketing degenerates on text payloads).
    */
  def phashes(media: DataFrame): Dataset[MediaPhash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: open decoder context here, once per partition
        rows.map { case (id, payload) =>
          val hist = new Array[Long](64)
          var i = 0
          while (i < payload.length - 1) {
            hist(((payload(i) & 0xff) * 131
              + (payload(i + 1) & 0xff)) % 64) += 1L
            i += 1
          }
          val w = new Array[Long](4)
          var k = 0
          while (k < 64) {
            if (hist(k) > hist((k + 17) % 64)) w(k / 16) |= 1L << (k % 16)
            k += 1
          }
          MediaPhash(id, w(0), w(1), w(2), w(3))
        }
      }
  }
}
