package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.ManifestTableStore

/** End-to-end streaming CDC upsert: a keyed change stream applied to the
  * manifest store via [[StreamingUpsert]] must materialize the latest
  * state per key, bound its rewrite scope by key stats, and stay
  * exactly-once under micro-batch replay.
  */
class CdcMergeSpec extends SparkSpec {

  import spark.implicits._

  private def newStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("cdc-merge-")
    p.toFile.deleteOnExit()
    new ManifestTableStore(p.toString, statsColumns = Seq("k"))
  }

  private def currentDirs(store: ManifestTableStore): Set[String] =
    store.read(spark).inputFiles
      .map(f => f.split("/data/").last.split('/').head).toSet

  test("keyed CDC stream materializes latest-state-per-key; intra-batch " +
      "updates to one key collapse to the newest record") {
    val store = newStore()
    // baseline state: keys 0-99 at seq 0
    store.append((0 until 100).map(k => (k.toLong, s"v0-$k", 0L))
      .toDF("k", "v", "seq"), 100L)
    val input = MemoryStream[(Long, String, Long)](spark)
    val q = input.toDF().toDF("k", "v", "seq")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt-").toString)
      .foreachBatch(StreamingUpsert.applyBatch(store, "k", "seq") _)
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 0: update k=5 twice (seq 1 then 2 — only seq 2 may win),
    // insert k=200
    input.addData(Seq((5L, "stale", 1L), (5L, "fresh", 2L),
      (200L, "new", 1L)))
    q.processAllAvailable()
    // batch 1: update k=200
    input.addData(Seq((200L, "newer", 2L)))
    q.processAllAvailable()
    q.stop()
    val state = store.read(spark).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(state.size == 101)
    assert(state(5L) == "fresh") // intra-batch last-writer-wins
    assert(state(200L) == "newer") // inserted then updated
    assert(state(50L) == "v0-50") // untouched key
  }

  test("rewrite scope is key-stats-bounded: a batch whose keys land in " +
      "one dir leaves the other dir physically untouched") {
    val store = newStore()
    store.append((0 until 100).map(k => (k.toLong, s"a$k", 0L))
      .toDF("k", "v", "seq"), 100L)
    store.append((1000 until 1100).map(k => (k.toLong, s"b$k", 0L))
      .toDF("k", "v", "seq"), 101L)
    val before = currentDirs(store)
    val input = MemoryStream[(Long, String, Long)](spark)
    val q = input.toDF().toDF("k", "v", "seq")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt-").toString)
      .foreachBatch(StreamingUpsert.applyBatch(store, "k", "seq") _)
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData(Seq((1050L, "changed", 1L)))
    q.processAllAvailable()
    q.stop()
    val after = currentDirs(store)
    // the low-key dir [0,99] is provably disjoint from the batch's key
    // range — same physical dir in the new version
    assert(before.intersect(after).exists(_.startsWith("batch-100-")))
    assert(!after.exists(_.startsWith("batch-101-"))) // rewritten
    assert(store.read(spark).filter(col("k") === 1050L)
      .select("v").as[String].head() == "changed")
  }

  test("SQL-text CDC apply: foreachBatch publishes the batch view and " +
      "runs one MERGE statement with a tombstone DELETE clause — the " +
      "general clause surface on the streaming path") {
    val store = newStore()
    store.append(Seq((1L, "a", 0L, false), (2L, "b", 0L, false),
      (3L, "c", 0L, false)).toDF("k", "v", "seq", "del"), 100L)
    val mergeSql =
      """MERGE INTO cdc_target USING cdc_batch
        |ON cdc_target.k = cdc_batch.k
        |WHEN MATCHED AND cdc_batch.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = cdc_batch.v,
        |  seq = cdc_batch.seq
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    val input = MemoryStream[(Long, String, Long, Boolean)](spark)
    val q = input.toDF().toDF("k", "v", "seq", "del")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt-").toString)
      .foreachBatch(StreamingUpsert.applySqlBatch(
        Map("cdc_target" -> store), mergeSql, "cdc_batch", "k", "seq") _)
      .trigger(Trigger.ProcessingTime(0)).start()
    // one micro-batch: update k=2, tombstone k=3, insert k=4
    input.addData(Seq((2L, "b2", 1L, false), (3L, "gone", 1L, true),
      (4L, "d", 1L, false)))
    q.processAllAvailable()
    q.stop()
    val state = store.read(spark).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(state == Map(1L -> "a", 2L -> "b2", 4L -> "d"),
      s"tombstone apply diverged: $state")
  }

  test("micro-batch replay (crash between merge and checkpoint commit) " +
      "is refused at write time — the CDC sink is exactly-once") {
    val store = newStore()
    store.append(Seq((1L, "base", 0L)).toDF("k", "v", "seq"), 100L)
    val batch = Seq((1L, "applied", 1L)).toDF("k", "v", "seq")
    StreamingUpsert.applyBatch(store, "k", "seq")(batch, 0L)
    // restart replays batch 0 with recomputed (different) content
    val replay = Seq((1L, "ghost", 9L)).toDF("k", "v", "seq")
    StreamingUpsert.applyBatch(store, "k", "seq")(replay, 0L)
    val state = store.read(spark).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(state == Map(1L -> "applied"))
  }
}
