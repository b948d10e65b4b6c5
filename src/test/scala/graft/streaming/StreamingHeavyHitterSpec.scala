package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The Misra-Gries aggregate is streaming-native: its capacity-bounded
  * buffer IS the query state, so a complete-mode streaming aggregation
  * gives a live top-talker monitor whose state never grows with the key
  * space. This pins the law that survives micro-batching: after any
  * prefix of batches, the emitted candidate set contains every key whose
  * TOTAL frequency so far exceeds N/(capacity+1) — the same guarantee
  * HeavyHitterSpec proves for batch, here across incremental state
  * updates and restarts of the merge path.
  */
class StreamingHeavyHitterSpec extends SparkSpec {

  import spark.implicits._

  test("streaming mg_sketch: candidate set after each micro-batch covers " +
      "every key heavy over the stream so far, at bounded state") {
    graft.functions.VectorExpressions.register(spark)
    val input = MemoryStream[String](spark)
    val q = input.toDS().toDF("wd")
      .groupBy()
      .agg(expr("mg_sketch(wd, 64)").as("cand"))
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Complete()).start()

    def candidates(): Set[String] = {
      val rows = spark.table("hh").collect()
      assert(rows.length == 1)
      rows.head.getSeq[String](0).toSet
    }
    // batch 1: 5 heavy keys x 500 + 2k distinct tail keys, interleaved
    val heavies = (0 until 5).map(i => s"H$i")
    val b1 = (0 until 2500).map { i =>
      if (i % 5 == 0) heavies((i / 5) % 5) else s"t$i"
    }
    input.addData(b1)
    q.processAllAvailable()
    val c1 = candidates()
    assert(c1.size <= 64, s"state exceeded capacity: ${c1.size}")
    // N1 = 2500, bound = N1/65 ~ 38; heavies have 100 each... recompute:
    // 500 heavy slots over 5 keys = 100 occurrences each > 38.
    assert(heavies.toSet.subsetOf(c1), s"batch-1 heavies missing: " +
      heavies.toSet.diff(c1))
    // batch 2: a NEW heavy key arrives hot; old heavies keep trickling
    val b2 = (0 until 2500).map { i =>
      if (i % 3 == 0) "H9" else if (i % 5 == 0) heavies((i / 5) % 5)
      else s"u$i"
    }
    input.addData(b2)
    q.processAllAvailable()
    val c2 = candidates()
    q.stop()
    assert(c2.size <= 64, s"state exceeded capacity: ${c2.size}")
    // totals now: H9 ~ 834 > bound (5000/65 ~ 77); H0..H4 ~ 100+100+ > 77
    assert((heavies.toSet + "H9").subsetOf(c2),
      s"stream-total heavies missing: ${(heavies.toSet + "H9").diff(c2)}")
  }
}
