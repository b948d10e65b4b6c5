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
}
