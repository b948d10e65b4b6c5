package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.streaming.EventStreams.Event

class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    Event(1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
    Event(2L, ts("2024-01-01 10:20:00"), 1L, "click", 2.0),
    Event(3L, ts("2024-01-01 11:10:00"), 1L, "view", 3.0), // >30min gap → new session
    Event(4L, ts("2024-01-01 10:30:00"), 2L, "click", 4.0),
    Event(5L, ts("2024-01-01 12:00:00"), 2L, "view", 5.0))

  /** Run a streaming transform of a MemoryStream to completion. */
  private def runStream(transform: DataFrame => DataFrame,
      mode: OutputMode, name: String,
      batches: Seq[Seq[Event]]): DataFrame = {
    val input = MemoryStream[Event](spark)
    val q = transform(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("tumbling windows aggregate by event-time hour (streaming)") {
    val out = runStream(EventStreams.tumblingCounts(_, "1 hour", "10 minutes"),
      OutputMode.Complete(), "tumbling", Seq(fixture))
    val got = out.orderBy("window_start", "event_type")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("10:00", "click", 3L), ("11:00", "view", 1L),
      ("12:00", "view", 1L)))
  }

  test("session windows merge events within the gap per user (streaming)") {
    val out = runStream(EventStreams.sessionCounts(_, "30 minutes", "5 minutes"),
      OutputMode.Complete(), "sessions", Seq(fixture))
    val got = out.orderBy("user_id", "session_start")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // user 1: (10:05,10:20) merge; 11:10 separate. user 2: two singletons.
    assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("dropDuplicatesWithinWatermark drops replayed event_ids (streaming)") {
    val dup = fixture.head.copy(value = 99.0) // same event_id, later replay
    val out = runStream(EventStreams.dedupWithinWatermark(_, "2 hours"),
      OutputMode.Append(), "dedup", Seq(fixture, Seq(dup)))
    assert(out.count() == fixture.size) // replay suppressed
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    val input = MemoryStream[Event](spark)
    // Wide watermark/idle so nothing in the fixture is late or expired —
    // this test is about accumulation; expiry has its own test below.
    val q = EventStreams.userRunningTotals(input.toDS(),
        watermark = "24 hours", idleTimeout = "48 hours")
      .writeStream.format("memory").queryName("totals")
      .outputMode(OutputMode.Update()).start()
    input.addData(fixture.take(3)) // user1: 3 events
    q.processAllAvailable()
    input.addData(fixture.drop(3)) // user2: 2 events
    q.processAllAvailable()
    q.stop()
    val last = spark.table("totals")
      .groupBy("user_id").agg(max("n_events").as("n"),
        max("total_value").as("v"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(last == Seq((1L, 3L, 6.0), (2L, 2L, 9.0)))
  }

  test("idle user state expires via event-time timeout and restarts fresh") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.userRunningTotals(input.toDS(),
        watermark = "0 seconds", idleTimeout = "1 hour")
      .writeStream.format("memory").queryName("totals_expire")
      .outputMode(OutputMode.Update()).start()
    // user1 active at 10:00-10:10 → timeout deadline 11:10.
    input.addData(Seq(
      Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Event(2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0)))
    q.processAllAvailable()
    // advance the watermark to 12:00 (> deadline)...
    input.addData(Seq(Event(3L, ts("2024-01-01 12:00:00"), 2L, "view", 4.0)))
    q.processAllAvailable()
    // ...timeouts are evaluated against the PREVIOUS batch's watermark, so
    // one more batch actually fires user1's expiry and removes its state.
    input.addData(Seq(Event(4L, ts("2024-01-01 12:30:00"), 2L, "view", 4.0)))
    q.processAllAvailable()
    // user1 returns: state was removed, so the total restarts from zero.
    input.addData(Seq(Event(5L, ts("2024-01-01 13:00:00"), 1L, "click", 5.0)))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("totals_expire").filter(col("user_id") === 1L)
      .select("n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // (2,3.0) from accumulation (re-emitted once at expiry), then a FRESH
    // (1,5.0) — never (3,8.0), which is what unexpired state would emit.
    assert(u1.contains((1L, 5.0)), s"fresh restart row missing: $u1")
    assert(!u1.contains((3L, 8.0)), s"state survived past expiry: $u1")
  }

  test("stream-stream interval join pairs views with purchases and agrees " +
      "with the batch plan") {
    val views = Seq(
      Event(10L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Event(11L, ts("2024-01-01 10:30:00"), 2L, "view", 0.0),
      Event(12L, ts("2024-01-01 09:00:00"), 3L, "view", 0.0))
    val purchases = Seq(
      // user1: within the 1h horizon of view 10 → joins
      Event(20L, ts("2024-01-01 10:40:00"), 1L, "purchase", 9.99),
      // user2: 2h after the view → outside horizon, no pair
      Event(21L, ts("2024-01-01 12:30:00"), 2L, "purchase", 5.0),
      // user3: BEFORE the view → no pair
      Event(22L, ts("2024-01-01 08:30:00"), 3L, "purchase", 1.0))
    // streaming × streaming
    val vIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val q = EventStreams.viewToPurchase(vIn.toDF(), pIn.toDF(), "1 hour")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    vIn.addData(views); pIn.addData(purchases)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss_join")
      .select("user_id", "view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(streamed == Seq((1L, 10L, 20L)), s"got $streamed")
    // identical code over static frames must agree
    val batch = EventStreams.viewToPurchase(views.toDF(), purchases.toDF(),
        "1 hour")
      .select("user_id", "view_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(batch == streamed, s"batch $batch != streamed $streamed")
  }

  test("stream-stream LEFT OUTER interval join emits unconverted views " +
      "with nulls once the watermark passes, and agrees with batch") {
    val views = Seq(
      Event(10L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Event(11L, ts("2024-01-01 10:30:00"), 2L, "view", 0.0),
      Event(12L, ts("2024-01-01 09:00:00"), 3L, "view", 0.0))
    val purchases = Seq(
      Event(20L, ts("2024-01-01 10:40:00"), 1L, "purchase", 9.99),
      Event(21L, ts("2024-01-01 12:30:00"), 2L, "purchase", 5.0), // late
      Event(22L, ts("2024-01-01 08:30:00"), 3L, "purchase", 1.0)) // early
    val vIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val q = EventStreams.viewToPurchaseOuter(vIn.toDF(), pIn.toDF(),
        "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode(OutputMode.Append()).start()
    vIn.addData(views); pIn.addData(purchases)
    q.processAllAvailable()
    // inner match emits immediately; view 12's horizon (ends 10:00) is
    // already behind the batch-1 watermark (min(10:30, 12:30) − 10 min =
    // 10:20) so its null row emits in the trailing no-data micro-batch —
    // but view 11 (horizon ends 11:30) must still be buffered
    assert(spark.table("ss_outer").count() == 2)
    assert(!spark.table("ss_outer").collect()
      .exists(_.getLong(1) == 11L), "view 11 emitted before its horizon")
    // advance event time on both sides (a matching pair a day later),
    // then one more batch so the passed watermark acts on buffered state
    vIn.addData(Seq(Event(90L, ts("2024-01-02 10:00:00"), 9L, "view", 0.0)))
    pIn.addData(Seq(
      Event(91L, ts("2024-01-02 10:01:00"), 9L, "purchase", 2.0)))
    q.processAllAvailable()
    pIn.addData(Seq(
      Event(92L, ts("2024-01-02 10:02:00"), 8L, "purchase", 3.0)))
    q.processAllAvailable()
    q.stop()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "view_id", "purchase_id", "unconverted")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toSeq.sorted
    val streamed = norm(spark.table("ss_outer"))
    assert(streamed == Seq(
      (1L, 10L, 20L, false), (2L, 11L, -1L, true),
      (3L, 12L, -1L, true), (9L, 90L, 91L, false)), s"got $streamed")
    // identical code over static frames must agree
    val batch = norm(EventStreams.viewToPurchaseOuter(
      (views :+ Event(90L, ts("2024-01-02 10:00:00"), 9L, "view", 0.0))
        .toDF(),
      (purchases ++ Seq(
        Event(91L, ts("2024-01-02 10:01:00"), 9L, "purchase", 2.0),
        Event(92L, ts("2024-01-02 10:02:00"), 8L, "purchase", 3.0)))
        .toDF(), "1 hour", "10 minutes"))
    assert(batch == streamed, s"batch $batch != streamed $streamed")
  }

  test("flatMapGroupsWithState funnel emits a StageEvent only when a user " +
      "reaches a NEW stage, in event order") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.streamingFunnel(input.toDS(),
        watermark = "24 hours", idleTimeout = "48 hours")
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    // user 1 completes the funnel; the click BEFORE the view must not
    // count; user 2 stalls at view.
    input.addData(Seq(
      Event(1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0), // pre-view
      Event(2L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Event(3L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0),
      Event(4L, ts("2024-01-01 10:30:00"), 2L, "view", 0.0)))
    q.processAllAvailable()
    // next batch: user 1 purchases; a REPEAT click emits nothing
    input.addData(Seq(
      Event(5L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0),
      Event(6L, ts("2024-01-01 11:10:00"), 1L, "purchase", 9.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel")
      .select("user_id", "stage").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq((1L, "1_view"), (1L, "2_view_click"),
      (1L, "3_view_click_purchase"), (2L, "1_view")), s"got $got")
  }

  test("streaming SCD2 emits closed intervals on state change and the " +
      "open tail at expiry") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.streamingScd2(input.toDS(),
        watermark = "0 seconds", idleTimeout = "1 hour")
      .writeStream.format("memory").queryName("scd2")
      .outputMode(OutputMode.Append()).start()
    // user1: view → view (no change) → click closes the view interval
    input.addData(Seq(
      Event(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Event(2L, ts("2024-01-01 10:05:00"), 1L, "view", 0.0),
      Event(3L, ts("2024-01-01 10:10:00"), 1L, "click", 0.0)))
    q.processAllAvailable()
    // a change arriving in a LATER batch closes across batches
    input.addData(Seq(Event(4L, ts("2024-01-01 10:30:00"), 1L, "view", 0.0)))
    q.processAllAvailable()
    // advance the watermark far past user1's deadline (two batches: the
    // timeout fires against the previous batch's watermark)
    input.addData(Seq(Event(5L, ts("2024-01-01 13:00:00"), 2L, "view", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(Event(6L, ts("2024-01-01 13:30:00"), 2L, "view", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("scd2").filter(col("user_id") === 1L)
      .select("state", "valid_from", "valid_to").collect()
      .map(r => (r.getString(0),
        Option(r.getTimestamp(1)).map(_.toString).orNull,
        Option(r.getTimestamp(2)).map(_.toString).orNull)).toSeq
      .sortBy(t => Option(t._2).getOrElse(""))
    assert(got == Seq(
      ("view", "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0"),
      ("click", "2024-01-01 10:10:00.0", "2024-01-01 10:30:00.0"),
      ("view", "2024-01-01 10:30:00.0", null)), s"got $got")
  }

  test("same code plans as a batch query (unified API)") {
    val batch = fixture.toDF()
    val got = EventStreams.tumblingCounts(batch)
      .orderBy("window_start", "event_type")
      .select("event_type", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("click", 3L), ("view", 1L), ("view", 1L)))
  }
}
