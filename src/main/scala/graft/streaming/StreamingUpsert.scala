package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.ManifestTableStore

/** Streaming CDC apply: the keyed-upsert cousin of the reference's
  * append-only foreachBatch sink (`bronze_assets_to_silver_assets.py:
  * 275-277`). Where the reference's silver table accretes rows, a CDC
  * silver table must hold the LATEST row per key — Delta's
  * `foreachBatch + MERGE` streaming pattern, built here on the manifest
  * store's copy-on-write [[ManifestTableStore.merge]].
  *
  * Per micro-batch: (1) reduce the batch to its last record per key
  * (`row_number` over `orderCol` descending — a batch can carry several
  * updates to one key and only the newest may win); (2) merge, keyed by
  * `key`, under the micro-batch's id. The merge rewrites only the data
  * dirs whose key stats overlap the batch's key range — at 100 TB a
  * micro-batch touching today's keys rewrites today's dirs, not the
  * table — and a replayed batch id (crash between merge and checkpoint
  * commit, then restart) is refused at write time, so the sink is
  * exactly-once end-to-end without read-side dedup.
  */
object StreamingUpsert {

  /** The foreachBatch body: `.foreachBatch(StreamingUpsert.applyBatch(
    * store, "k", "seq") _)`. Micro-batch ids are scoped through the
    * store's `writerBase(writerId)` namespace (Delta's txn writer):
    * ids restart at 0 per checkpoint, so an unscoped id over a table
    * seeded by direct appends — or beside a second CDC stream — would
    * replay-drop real batches. Two upsert streams into one table need
    * distinct `writerId`s.
    */
  def applyBatch(store: ManifestTableStore, key: String, orderCol: String,
      writerId: String = "cdc-upsert")(
      batch: DataFrame, batchId: Long): Unit = {
    val latest = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(key).orderBy(col(orderCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val base = store.writerBase(batch.sparkSession, writerId)
    store.merge(batch.sparkSession, latest, key, base + batchId)
  }

  /** The SQL-TEXT variant — Delta's documented `foreachBatch { df =>
    * df.createOrReplaceTempView(...); spark.sql("MERGE INTO ...") }`
    * streaming-CDC pattern, verbatim: per micro-batch the key-reduced
    * batch is published as `viewName` and the caller's MERGE statement
    * runs through [[graft.engine.StoreSql]] under the micro-batch id,
    * with the GENERAL clause surface available (conditional matched
    * clauses, column-level SET, matched DELETE, by-source retirement)
    * — so a tombstone-aware CDC apply is one statement, not custom
    * code. Exactly-once by the same write-time replay refusal.
    * `mergeSql` must name `viewName` as its USING source.
    */
  def applySqlBatch(tables: Map[String, ManifestTableStore],
      mergeSql: String, viewName: String, key: String, orderCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val latest = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(key).orderBy(col(orderCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    latest.createOrReplaceTempView(viewName)
    // id namespace per (target, batch-view): same txn-writer scoping as
    // applyBatch, keyed so two SQL CDC streams need distinct view names
    require(tables.size == 1,
      "applySqlBatch applies one statement to one target store")
    val spark = batch.sparkSession
    val store = tables.head._2
    graft.engine.StoreSql.exec(spark, tables, mergeSql,
      batchId = Some(store.writerBase(spark, s"cdc-$viewName") + batchId))
  }
}
