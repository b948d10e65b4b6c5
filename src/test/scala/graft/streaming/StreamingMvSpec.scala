package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.StoreCatalog

/** Streaming-maintained materialized view — the reference's gold layer
  * (README.md:25) in its natural streaming form: a `graft-store` change
  * stream over the source drives `REFRESH MATERIALIZED VIEW` per
  * trigger through foreachBatch. The refresh is idempotent by
  * construction (its fold batch id derives from the SOURCE version, not
  * the stream's micro-batch id), so checkpoint resume and replayed
  * micro-batches are no-ops — never a double-fold.
  */
class StreamingMvSpec extends SparkSpec {

  import spark.implicits._

  test("appends stream into per-trigger REFRESH; AvailableNow resume " +
      "from the same checkpoint never double-folds; final content " +
      "equals the batch recompute") {
    val base = Files.createTempDirectory("stream-mv-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark,
      "CREATE TABLE smv_src (k STRING, n BIGINT) USING graft_store")
    cat.exec(spark,
      "INSERT INTO smv_src VALUES ('a', 1), ('b', 2)",
      batchId = Some(0L))
    val defn = "SELECT k, COUNT(*) AS cnt, SUM(n) AS total " +
      "FROM smv_src GROUP BY k"
    cat.exec(spark, s"CREATE MATERIALIZED VIEW smv AS $defn",
      batchId = Some(100L))
    val srcPath = cat.resolve(spark, "smv_src").get.tablePath
    val ckpt = Files.createTempDirectory("stream-mv-ckpt-").toString
    val refreshModes = new scala.collection.mutable.ArrayBuffer[String]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-store")
        .option("path", srcPath).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (_: DataFrame, _: Long) =>
          val mode = cat.exec(spark, "REFRESH MATERIALIZED VIEW smv")
            .head().getString(0)
          refreshModes.synchronized { refreshModes += mode }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow must terminate")
    }
    def served(): Map[String, (Long, Long)] = cat.query(spark,
      "SELECT k, cnt, total FROM smv").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def recomputed(): Map[String, (Long, Long)] = cat.query(spark, defn)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // trigger 1: the create-time snapshot drains as a catch-up batch;
    // the refresh sees nothing newer than the MV already holds
    drain()
    assert(served() == recomputed())
    // new appends → next AvailableNow run refreshes incrementally
    cat.exec(spark, "INSERT INTO smv_src VALUES ('a', 10), ('c', 5)",
      batchId = Some(1L))
    drain()
    assert(served() == recomputed())
    assert(served()("a") == ((2L, 11L)))
    assert(refreshModes.exists(_ == "incremental"), refreshModes)
    // resume from the SAME checkpoint with no new data: either no
    // batch fires, or a replayed one refreshes into 'current' —
    // NEVER a double-fold
    val before = served()
    drain()
    assert(served() == before, "resume must not re-fold")
    // two more appends across one drain: the refresh folds whatever
    // window the trigger sees, content converges to the recompute
    cat.exec(spark, "INSERT INTO smv_src VALUES ('b', 7)",
      batchId = Some(2L))
    cat.exec(spark, "INSERT INTO smv_src VALUES ('c', 3), ('d', 4)",
      batchId = Some(3L))
    drain()
    assert(served() == recomputed())
    assert(served() == Map("a" -> ((2L, 11L)), "b" -> ((2L, 9L)),
      "c" -> ((2L, 8L)), "d" -> ((1L, 4L))))
    // every refresh the stream drove reported a honest mode
    assert(refreshModes.forall(m =>
      m == "incremental" || m == "current"), refreshModes)
  }

  test("two-source streaming gold MV (the reference's silver→gold " +
      "topology): change streams over BOTH silver tables drive the " +
      "same aggregate-over-UNION-ALL refresh; interleaved and " +
      "concurrent triggers never double-fold, a CDC delete retracts, " +
      "and the final gold equals the batch recompute") {
    val base = Files.createTempDirectory("stream-mv2-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    Seq("ga", "gb").foreach(t => cat.exec(spark,
      s"CREATE TABLE $t (k STRING, n BIGINT) USING graft_store"))
    cat.exec(spark, "INSERT INTO ga VALUES ('a', 1), ('b', 2)",
      batchId = Some(0L))
    cat.exec(spark, "INSERT INTO gb VALUES ('b', 3), ('c', 4)",
      batchId = Some(0L))
    val defn = "SELECT k, COUNT(*) AS cnt, SUM(n) AS total " +
      "FROM (SELECT k, n FROM ga UNION ALL SELECT k, n FROM gb) " +
      "GROUP BY k"
    cat.exec(spark, s"CREATE MATERIALIZED VIEW gold AS $defn",
      batchId = Some(100L))
    val ckpts = Map(
      "ga" -> Files.createTempDirectory("gold-ckpt-a-").toString,
      "gb" -> Files.createTempDirectory("gold-ckpt-b-").toString)
    def streamOf(src: String) = {
      val path = cat.resolve(spark, src).get.tablePath
      spark.readStream.format("graft-store")
        .option("path", path).load()
        .writeStream
        .option("checkpointLocation", ckpts(src))
        .foreachBatch { (_: DataFrame, _: Long) =>
          cat.exec(spark, "REFRESH MATERIALIZED VIEW gold")
          ()
        }
        .trigger(Trigger.AvailableNow())
    }
    def drain(srcs: String*): Unit = {
      // start every query BEFORE awaiting any — concurrent triggers
      // race their refreshes exactly as two live silver feeds would
      val qs = srcs.map(s => streamOf(s).start())
      qs.foreach(q =>
        assert(q.awaitTermination(120000), "AvailableNow must end"))
    }
    def served(): Map[String, (Long, Long)] = cat.query(spark,
      "SELECT k, cnt, total FROM gold").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def recomputed(): Map[String, (Long, Long)] = cat.query(spark, defn)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    drain("ga", "gb") // catch-up snapshots; MV already current
    assert(served() == recomputed())
    // one source moves, only its stream drains — the fold advances
    // that source's watermark alone
    cat.exec(spark, "INSERT INTO ga VALUES ('c', 10)",
      batchId = Some(1L))
    drain("ga")
    assert(served() == recomputed())
    assert(served()("c") == ((2L, 14L)))
    // both sources move, both streams drain CONCURRENTLY: version-
    // derived fold bids make whichever refresh lands second a no-op
    // or an incremental continuation — never a double-fold
    cat.exec(spark, "INSERT INTO ga VALUES ('d', 7)",
      batchId = Some(2L))
    cat.exec(spark, "INSERT INTO gb VALUES ('d', 8), ('a', 6)",
      batchId = Some(1L))
    drain("ga", "gb")
    assert(served() == recomputed())
    assert(served()("d") == ((2L, 15L)))
    // CDC delete on one silver retracts through the streaming refresh
    cat.exec(spark, "DELETE FROM gb WHERE k = 'b'")
    drain("gb")
    assert(served() == recomputed())
    assert(served()("b") == ((1L, 2L)))
    // replay from the same checkpoints with nothing new: stable
    val before = served()
    drain("ga", "gb")
    assert(served() == before, "resume must not re-fold")
    assert(served() == Map("a" -> ((2L, 7L)), "b" -> ((1L, 2L)),
      "c" -> ((2L, 14L)), "d" -> ((2L, 15L))))
  }
}
