package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("media table has the canonical multimodal schema") {
    val m = MultimodalOps.mediaTable(spark, dir)
    assert(m.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    assert(m.select("kind").distinct().count() == 3)
  }

  test("payload bytes round-trip (binary column carries exact content)") {
    val row = MultimodalOps.mediaTable(spark, dir)
      .filter(col("media_id") === 0).select("payload").head()
    val text = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == text)
  }

  test("resizePayloads bounds every payload to the byte budget, keeps " +
      "schema shape, and is deterministic") {
    val m = MultimodalOps.mediaTable(spark, dir)
    val r = MultimodalOps.resizePayloads(m, targetBytes = 64)
    assert(r.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload",
      "meta"))
    val rows = r.select(col("payload"), col("meta.n_bytes")).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val p = row.getAs[Array[Byte]](0)
      assert(p.length <= 64)
      assert(row.getLong(1) == p.length.toLong) // meta tracks resized size
    }
    // deterministic: same input → same bytes
    val again = MultimodalOps.resizePayloads(m, 64)
      .filter(col("media_id") === 0).select("payload").head().getAs[Array[Byte]](0)
    val first = r.filter(col("media_id") === 0)
      .select("payload").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(again, first))
  }

  test("decodeFeatures is deterministic and schema-stable") {
    val f1 = MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, dir)).collect()
      .map(f => (f.media_id, f.width, f.features.toSeq)).sortBy(_._1)
    val f2 = MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, dir)).collect()
      .map(f => (f.media_id, f.width, f.features.toSeq)).sortBy(_._1)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall { case (_, w, feats) =>
      w >= 32 && feats.length == 8 && math.abs(feats.sum - 1.0) < 1e-9 })
  }

  test("frame sampling explodes only video rows, bounded by maxFrames") {
    val frames = MultimodalOps.sampleFrames(
      MultimodalOps.mediaTable(spark, dir), maxFrames = 4)
    val n = MultimodalOps.mediaTable(spark, dir)
      .filter(col("kind") === "video").count()
    assert(frames.select("media_id").distinct().count() == n)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.agg(max("count")).head().getLong(0) <= 4)
  }

  test("pHash near-dup (q134) laws: identical payloads collide at " +
      "hamming 0, a near-identical payload lands within the budget, " +
      "unrelated payloads stay apart") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog while " +
      "seventy zebras quietly photograph mixed jazz vibes ") * 4
    val media = Seq(
      (1L, base),                          // original
      (2L, base),                          // byte-identical copy
      (3L, base.dropRight(3) + "cat"),     // near-identical tail edit
      (4L, "entirely different content with other letter statistics " +
        "qqq xxx zzz www kkk vvv jjj fff ggg hhh " * 5))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val fps = MultimodalOps.phashes(media).collect()
      .map(f => f.media_id -> Seq(f.b0, f.b1, f.b2, f.b3)).toMap
    def hamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
    assert(hamming(fps(1L), fps(2L)) == 0,
      "byte-identical payloads must share the fingerprint")
    assert(hamming(fps(1L), fps(3L)) <= 3,
      s"near-identical payload at hamming ${hamming(fps(1L), fps(3L))}")
    assert(hamming(fps(1L), fps(4L)) > 3,
      s"unrelated payload too close: ${hamming(fps(1L), fps(4L))}")
  }
}
