package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.engine.Tables

/** Event-time analytics in batch form — the oracle-checkable analogs of the
  * streaming operators in `graft.streaming.EventStreams` (same semantics,
  * DuckDB-verifiable). Streaming variants are covered by specs.
  */
object EventOps {

  val defs: Seq[QueryDef] = Seq(

    // Sessionization as gaps-and-islands: a session breaks after a >30 min
    // gap. One shuffle on user_id; both window passes reuse the partition.
    QueryDef(
      "q23_sessionize",
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |              OR date_diff('second', prev_ts, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM m),
        |g AS (
        |  SELECT user_id, sess_id, COUNT(*) AS n_events
        |  FROM s GROUP BY user_id, sess_id)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS total_events,
        |  CAST(MAX(n_events) AS BIGINT) AS max_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
            1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(running))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("total_events"),
          max(col("n_events")).as("max_session_events"))
        .orderBy("user_id")
    },

    // As-of join: each event matched to the same user's most recent
    // purchase at-or-before it. Spark lacks a native ASOF operator; see
    // [[asofJoin]] for the sort-merge composition (union + one window —
    // NOT the equi+range join, whose intermediate explodes). DuckDB's
    // native ASOF JOIN is the oracle.
    QueryDef(
      "q27_asof_join",
      """SELECT a.event_id, b.event_id AS prev_purchase_id
        |FROM events a ASOF LEFT JOIN (
        |  SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts
        |ORDER BY a.event_id""".stripMargin) { (s, dir) =>
      val a = Tables(s, dir, "events").select(
        col("event_id"), col("user_id"), col("ts"))
      val p = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      asofJoin(a, p, leftKey = "user_id", rightKey = "p_user",
          leftTs = "ts", rightTs = "p_ts", payload = "p_id",
          outCol = "prev_purchase_id")
        .select("event_id", "prev_purchase_id")
        .orderBy("event_id")
    },

    // Sliding event-time windows (2h duration, 1h slide): every event lands
    // in exactly two epoch-aligned windows.
    QueryDef(
      "q24_sliding_window",
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       COUNT(*) AS n
        |FROM (
        |  SELECT date_trunc('hour', ts) - INTERVAL (k) HOUR AS ws
        |  FROM events CROSS JOIN (VALUES (0), (1)) t(k))
        |GROUP BY ws ORDER BY window_start""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("n"))
        .orderBy("window_start")
    })

  /** Sort-merge LEFT as-of join: every left row gains `outCol` = the
    * `payload` of the newest right row with the same key and
    * rightTs <= leftTs (null when none; ties on ts resolve to the
    * largest payload — deterministic output).
    *
    * Shape: tag both sides, union, ONE window per key ordered
    * (ts, side, payload) with a running `last(payload, ignoreNulls)` —
    * right rows sort before left rows at equal ts, so "at-or-before" is
    * inclusive. This is the 100 TB-safe as-of: one hash partition on the
    * key + one sort, intermediate size = |left| + |right|. The tempting
    * equi+range join alternative (join on key with ts <= ts, then top-1
    * per left row) materializes every (left row × earlier right row)
    * pair first — quadratic per key, and measured 4x slower at sf0.1
    * with only ~100 rights per key.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: String, outCol: String): DataFrame = {
    val pType = right.schema(payload).dataType
    val lSide = left.select(col(leftKey).as("k"), col(leftTs).as("t"),
      lit(null).cast(pType).as("p"), lit(1).as("side"),
      struct(left.columns.map(col): _*).as("l"))
    val rSide = right.select(col(rightKey).as("k"), col(rightTs).as("t"),
      col(payload).as("p"), lit(0).as("side"),
      lit(null).cast(lSide.schema("l").dataType).as("l"))
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("side"), col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn(outCol, last(col("p"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("l.*"), col(outCol))
  }
}
