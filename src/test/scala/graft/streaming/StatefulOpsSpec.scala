package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.Event

/** transformWithState (Spark 4 arbitrary stateful processing): running
  * profiles over ValueState + MapState, and explicit per-key timers
  * expiring idle users — the same contracts EventStreamsSpec proves for
  * the mapGroupsWithState generation, on the new API + RocksDB store.
  */
class StatefulOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** transformWithState requires the RocksDB state store; scope it to the
    * query and restore the suite default after.
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

  test("transformWithState keeps running totals and per-type frequencies " +
      "(ValueState + MapState) across batches") {
    withRocksDB {
      val input = MemoryStream[Event](spark)
      val q = StatefulOps.userProfiles(input.toDS(),
          watermark = "24 hours", idleGap = Duration.ofHours(48))
        .writeStream.format("memory").queryName("profiles")
        .outputMode(OutputMode.Update()).start()
      input.addData(Seq(
        Event(1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.0),
        Event(3L, ts("2024-01-01 11:10:00"), 1L, "view", 3.0),
        Event(4L, ts("2024-01-01 10:30:00"), 2L, "click", 4.0)))
      q.processAllAvailable()
      input.addData(Seq( // user1 shifts majority to views across batches
        Event(5L, ts("2024-01-01 11:30:00"), 1L, "view", 10.0),
        Event(6L, ts("2024-01-01 11:40:00"), 1L, "view", 1.0),
        Event(7L, ts("2024-01-01 11:45:00"), 2L, "view", 5.0)))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("profiles")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n_events").desc)))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(last == Seq(
        (1L, 5L, 17.0, "view", 3L), // 2 clicks + 3 views, MapState summed
        (2L, 2L, 9.0, "click", 1L)), // 1:1 tie breaks lexically-first
        s"got $last")
    }
  }

  test("idle user's explicit timer fires once the watermark passes: final " +
      "snapshot emitted, all state cleared, later events restart fresh") {
    withRocksDB {
      val input = MemoryStream[Event](spark)
      val q = StatefulOps.userProfiles(input.toDS(),
          watermark = "0 seconds", idleGap = Duration.ofHours(1))
        .writeStream.format("memory").queryName("profiles_expire")
        .outputMode(OutputMode.Update()).start()
      // user1 active until 10:10 → timer armed for 11:10
      input.addData(Seq(
        Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0)))
      q.processAllAvailable()
      // advance the watermark past the deadline; timers are evaluated
      // against the previous batch's watermark, so two batches fire it
      input.addData(Seq(Event(3L, ts("2024-01-01 12:00:00"), 2L, "view", 4.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(4L, ts("2024-01-01 12:30:00"), 2L, "view", 4.0)))
      q.processAllAvailable()
      // user1 returns: ValueState AND MapState were cleared at expiry
      input.addData(Seq(Event(5L, ts("2024-01-01 13:00:00"), 1L, "view", 5.0)))
      q.processAllAvailable()
      q.stop()
      val u1 = spark.table("profiles_expire").filter(col("user_id") === 1L)
        .select("n_events", "total_value", "top_type").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      // fresh restart counts ONLY the new view — cleared MapState means
      // top_type is view/1, not click/2 carried over
      assert(u1.contains((1L, 5.0, "view")), s"fresh restart missing: $u1")
      assert(!u1.exists(r => r._1 == 3L), s"state survived expiry: $u1")
    }
  }
}
