package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Beyond-reference stateful streaming surface (SURVEY §2.9 "not present"
  * list, §7.2 M4): event-time windows + watermarks, session windows,
  * bounded-state dedup, and custom per-key state. The reference pipeline is
  * insert-only ELT with processing time only; these are the event-time
  * operators a gold layer needs.
  *
  * All functions take a streaming OR batch DataFrame shaped like the
  * `events` table (`ts timestamp, user_id long, event_type string,
  * value double`) — same code plans both ways, which is how Structured
  * Streaming is meant to be used.
  *
  * Scale: every aggregation here is keyed on (window/session, key), so
  * state is hash-partitioned across executors; watermarks bound state
  * size — without them a 100 TB stream would accumulate state forever.
  */
object EventStreams {

  /** Tumbling event-time counts with a watermark bounding late data. */
  def tumblingCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding windows (overlapping): each event lands in
    * duration/slide windows.
    */
  def slidingCounts(events: DataFrame, duration: String = "2 hours",
      slide: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), duration, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** Session windows: events within `gap` of each other merge into one
    * session per user.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Exactly-once-per-key semantics with bounded state: duplicates of
    * `event_id` arriving within the watermark horizon are dropped.
    */
  def dedupWithinWatermark(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  // --- custom state: per-user running aggregate via GroupState ---

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom per-key state (mapGroupsWithState): running per-user totals,
    * updated every micro-batch. The GroupState hook is the escape hatch
    * for semantics window/session aggregates can't express.
    *
    * State is BOUNDED: a key idle for `idleTimeout` past the event-time
    * watermark is expired — the final snapshot is emitted once more and the
    * state removed, so a later event for the same user starts a fresh
    * total. Without this, per-user state on an unbounded user population
    * grows forever (the 100 TB failure mode of keyed state).
    */
  def userRunningTotals(events: Dataset[Event],
      watermark: String = "10 minutes",
      idleTimeout: String = "1 hour"): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserAgg]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
            var maxTs = Long.MinValue
            val updated = batch.foldLeft(prev) { (acc, e) =>
              maxTs = math.max(maxTs, e.ts.getTime)
              UserAgg(userId, acc.n_events + 1, acc.total_value + e.value)
            }
            state.update(updated)
            // Idle = no events for idleTimeout in EVENT time: deadline is
            // anchored on this key's newest event (floored at the watermark,
            // which Spark requires deadlines to exceed), so the key expires
            // once the watermark passes last-seen + idleTimeout.
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1), idleTimeout)
            updated
          }
      }
  }

  final case class FunnelState(stage: Int, sinceTs: java.sql.Timestamp)
  final case class StageEvent(user_id: Long, stage: String,
      at: java.sql.Timestamp)

  /** Streaming conversion funnel via `flatMapGroupsWithState` — the
    * flatMap variant of custom state (zero-or-more outputs per group per
    * batch, where mapGroups must emit exactly one): per user, track
    * progress through view → click → purchase in event order and emit a
    * StageEvent each time a NEW stage is reached; batches that advance
    * nothing emit nothing. The batch analog is q68; state is one (int,
    * timestamp) per user, expired after `idleTimeout` past the watermark
    * like userRunningTotals.
    */
  def streamingFunnel(events: Dataset[Event],
      watermark: String = "10 minutes",
      idleTimeout: String = "1 hour"): Dataset[StageEvent] = {
    import events.sparkSession.implicits._
    val order = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    val names = Map(1 -> "1_view", 2 -> "2_view_click",
      3 -> "3_view_click_purchase")
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(
              FunnelState(0, new java.sql.Timestamp(0L)))
            var maxTs = Long.MinValue
            val out = Seq.newBuilder[StageEvent]
            // event-time order within the batch; the funnel is ordered
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              val stage = order.getOrElse(e.event_type, 0)
              // advance only to the IMMEDIATE next stage, strictly after
              // the previous stage's event (same contract as q68)
              if (stage == st.stage + 1 &&
                  (st.stage == 0 || e.ts.getTime > st.sinceTs.getTime)) {
                st = FunnelState(stage, e.ts)
                out += StageEvent(userId, names(stage), e.ts)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1), idleTimeout)
            out.result().iterator
          }
      }
  }

  final case class ScdState(state: String, sinceMs: Long)
  final case class ScdInterval(user_id: Long, state: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp)

  /** Streaming SCD2 (batch analog: q73): per user, track the current
    * state and emit a CLOSED [valid_from, valid_to) interval whenever a
    * state CHANGE arrives — append-mode-safe because closed intervals
    * are final. The still-open interval lives in state (one small tuple
    * per key) and is emitted with a null `valid_to` when the key expires
    * `idleTimeout` past the watermark — so the full interval history,
    * open tail included, reaches the sink with bounded state.
    *
    * Events are processed in event-time order within a batch; cross-batch
    * order is the watermark's contract (same assumption as
    * [[streamingFunnel]]).
    */
  def streamingScd2(events: Dataset[Event],
      watermark: String = "10 minutes",
      idleTimeout: String = "1 hour"): Dataset[ScdInterval] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[ScdState]) =>
          if (state.hasTimedOut) {
            val openTail = state.getOption.map(s => ScdInterval(userId,
              s.state, new java.sql.Timestamp(s.sinceMs), null))
            state.remove()
            openTail.iterator
          } else {
            var cur = state.getOption.orNull
            var maxTs = Long.MinValue
            val out = Seq.newBuilder[ScdInterval]
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              if (cur == null) cur = ScdState(e.event_type, e.ts.getTime)
              else if (e.event_type != cur.state) {
                out += ScdInterval(userId, cur.state,
                  new java.sql.Timestamp(cur.sinceMs), e.ts)
                cur = ScdState(e.event_type, e.ts.getTime)
              }
            }
            state.update(cur)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1), idleTimeout)
            out.result().iterator
          }
      }
  }

  /** Stream-stream inner join with an event-time interval bound: each
    * `view` pairs with `purchase`s by the same user within
    * [view.ts, view.ts + horizon]. Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions — that pair of
    * constraints is what lets Spark evict buffered rows once the
    * watermark passes (unbounded join state is the stream-stream failure
    * mode at 100 TB; with the bounds, state per side is
    * watermark + horizon wide and hash-partitioned by user_id).
    *
    * Same code plans batch (both inputs static) and streaming — the spec
    * drives both and asserts they agree.
    */
  def viewToPurchase(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    v.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts",
        "value")
  }

  /** Stream-stream LEFT OUTER interval join — the conversion-funnel
    * question [[viewToPurchase]] cannot answer: which views did NOT
    * convert? Same interval bounds and watermarks (they remain the state
    * -eviction contract), but unmatched views are EMITTED with null
    * purchase columns once the watermark proves no purchase can still
    * arrive in their horizon — the outer row's emission is itself a
    * watermark-driven event, which is why this mode needs its own
    * coverage: an inner join only ever drops state at eviction, an outer
    * join must also act on it. Same code plans batch (left join) and
    * streaming; the spec drives both and asserts they agree once the
    * watermark passes.
    */
  def viewToPurchaseOuter(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    v.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
      "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("value"),
        col("purchase_id").isNull.as("unconverted"))
  }

  /** Output mode for the windowed aggregations when run as streams:
    * append emits only finalized (watermark-passed) windows.
    */
  val AppendMode: OutputMode = OutputMode.Append()
}
