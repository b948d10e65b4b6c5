package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.EventStreams.Event

/** Spark 4's arbitrary-stateful-processing operator
  * (`transformWithState`, the successor to `mapGroupsWithState` used by
  * [[EventStreams.userRunningTotals]]): state is declared as named typed
  * handles (ValueState/ListState/MapState) instead of one opaque blob,
  * expiry is an explicit per-key timer instead of a timeout enum, and the
  * runtime requires the RocksDB state store — the backend that keeps keyed
  * state on disk with changelog checkpointing, which is what makes
  * billions of keys per executor viable at 100 TB (the HDFS-backed store
  * holds every key in executor heap).
  *
  * Beyond-reference surface (SURVEY §2.9 "not present" list): the
  * reference pipeline is insert-only ELT; this is the gold-layer custom
  * state hook in its Spark-4-native form.
  */
object StatefulOps {

  /** Per-user profile maintained across batches: running totals plus the
    * user's most frequent event type.
    */
  final case class UserProfile(user_id: Long, n_events: Long,
      total_value: Double, top_type: String, top_type_n: Long)

  /** Running per-user totals + per-event-type frequencies, expiring idle
    * users via an event-time timer — `userRunningTotals` re-expressed on
    * the transformWithState API, exercising all three state primitives:
    *
    *   - `totals: ValueState[UserProfile]` — the running aggregate;
    *   - `typeCounts: MapState[String, Long]` — per-event-type tallies
    *     (a map the old API would force into one serialized blob,
    *     rewritten wholesale every batch; here each key updates
    *     independently in RocksDB);
    *   - one explicit timer per key, re-armed on every batch to
    *     last-event-time + idleGap: when the watermark passes it,
    *     [[UserTotalsProcessor.handleExpiredTimer]] emits the final
    *     snapshot and clears all state — the bounded-state contract,
    *     stated as code instead of a timeout mode.
    */
  def userProfiles(events: Dataset[Event],
      watermark: String = "10 minutes",
      idleGap: java.time.Duration =
        java.time.Duration.ofHours(1)): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor(idleGap.toMillis),
        TimeMode.EventTime(), OutputMode.Update())
  }

  final class UserTotalsProcessor(idleGapMs: Long)
      extends StatefulProcessor[Long, Event, UserProfile] {

    @transient private var totals: ValueState[UserProfile] = _
    @transient private var typeCounts
        : org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var armedTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState("totals",
        Encoders.product[UserProfile], TTLConfig.NONE)
      typeCounts = getHandle.getMapState("typeCounts", Encoders.STRING,
        Encoders.scalaLong, TTLConfig.NONE)
      armedTimer = getHandle.getValueState("armedTimer", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[UserProfile] = {
      var n = 0L; var total = 0.0; var maxTs = Long.MinValue
      rows.foreach { e =>
        n += 1; total += e.value; maxTs = math.max(maxTs, e.ts.getTime)
        val seen = if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, seen + 1)
      }
      val prev = if (totals.exists()) totals.get()
        else UserProfile(key, 0L, 0.0, "", 0L)
      // ties break to the lexically-first type: deterministic output
      val (topType, topN) = typeCounts.iterator()
        .maxBy { case (t, c) => (c, t) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
      val updated = UserProfile(key, prev.n_events + n,
        prev.total_value + total, topType, topN)
      totals.update(updated)
      // one live timer per key: re-arm to newest-event + idleGap (floored
      // above the watermark, which timers must exceed to ever fire late)
      val deadline =
        math.max(maxTs, tv.getCurrentWatermarkInMs() + 1) + idleGapMs
      if (armedTimer.exists()) getHandle.deleteTimer(armedTimer.get())
      getHandle.registerTimer(deadline)
      armedTimer.update(deadline)
      Iterator.single(updated)
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[UserProfile] = {
      val last = if (totals.exists()) Iterator.single(totals.get())
        else Iterator.empty
      totals.clear(); typeCounts.clear(); armedTimer.clear()
      last
    }
  }
}
