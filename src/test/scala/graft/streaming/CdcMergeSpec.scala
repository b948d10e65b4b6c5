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

  test("a downstream sync consumes the upstream FULL change feed: " +
      "deletes arrive as tombstones and retire downstream rows, and " +
      "re-applying the feed is idempotent by clause design") {
    val upP = Files.createTempDirectory("cdc-up-")
    upP.toFile.deleteOnExit()
    val up = new ManifestTableStore(upP.toString,
      statsColumns = Seq("k"))
    up.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), 0L)
    val down = newStore()
    down.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      100L) // seeded with upstream v1's state
    // upstream evolves: CoW delete k=2, update k=1, append k=4
    up.delete(spark, "k = 2")                              // v2
    up.update(spark, "k = 1", Map("v" -> lit("a2")))       // v3
    up.append(Seq((4L, "d")).toDF("k", "v"), 1L)           // v4
    // the v1→v4 feed: delete(2,b), delete(1,a)+insert(1,a2) pair,
    // insert(4,d). An update pair shares a key, so the sync reduces to
    // ONE row per key by _change_type DESC — 'insert' outranks
    // 'delete', which is exactly "an update nets to its postimage";
    // a pure retirement has only its tombstone and survives as one.
    val feed = up.readChangeFeed(spark, 1, 4)
      .select("k", "v", "_change_type").as[(Long, String, String)]
      .collect().toSeq
    val mergeSql =
      """MERGE INTO sync_target USING sync_batch
        |ON sync_target.k = sync_batch.k
        |WHEN MATCHED AND sync_batch._change_type = 'delete'
        |  THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = sync_batch.v
        |WHEN NOT MATCHED AND sync_batch._change_type = 'insert'
        |  THEN INSERT (k, v) VALUES (sync_batch.k, sync_batch.v)"""
        .stripMargin
    val input = MemoryStream[(Long, String, String)](spark)
    val q = input.toDF().toDF("k", "v", "_change_type")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt-").toString)
      .foreachBatch(StreamingUpsert.applySqlBatch(
        Map("sync_target" -> down), mergeSql, "sync_batch", "k",
        "_change_type") _)
      .trigger(Trigger.ProcessingTime(0)).start()
    input.addData(feed)
    q.processAllAvailable()
    // re-deliver the whole feed (an at-least-once upstream): matched
    // updates are idempotent, the tombstone finds no match, the insert
    // matches and re-SETs the same value
    input.addData(feed)
    q.processAllAvailable()
    q.stop()
    val state = down.read(spark).select("k", "v").as[(Long, String)]
      .collect().toMap
    val upstream = up.read(spark).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(state == upstream,
      s"sync diverged: downstream=$state upstream=$upstream")
    assert(state == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
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
