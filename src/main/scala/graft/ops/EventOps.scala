package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.engine.Tables
import graft.engine.Pin.Pinnable

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

    // Conversion funnel: users who viewed, then clicked AFTER their first
    // view, then purchased AFTER that first qualifying click — the
    // event-ordering analytics a gold layer exists for. Three
    // aggregate-then-join stages, each a hash-partitioned min per user;
    // stage frames shrink monotonically so the joins get cheaper down
    // the funnel.
    QueryDef(
      "q68_funnel",
      """WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |  JOIN v ON v.user_id = e.user_id AND e.ts > v.t
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |  JOIN c ON c.user_id = e.user_id AND e.ts > c.t
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |  UNION ALL SELECT '2_view_click', COUNT(*) FROM c
        |  UNION ALL SELECT '3_view_click_purchase', COUNT(*) FROM p) t
        |ORDER BY stage""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events").select("user_id", "event_type", "ts")
      def firstAfter(of: String, prev: DataFrame): DataFrame = {
        val base = ev.filter(col("event_type") === of)
        prev.toDF("user_id", "prev_t")
          .join(base, "user_id")
          .filter(col("ts") > col("prev_t"))
          .groupBy("user_id").agg(min(col("ts")).as("t"))
      }
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t"))
      val c = firstAfter("click", v)
      val p = firstAfter("purchase", c)
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"),
          col("n_users"))
      stage("1_view", v)
        .unionByName(stage("2_view_click", c))
        .unionByName(stage("3_view_click_purchase", p))
        .orderBy("stage")
    },

    // Cohort retention: users grouped by first-activity week, activity
    // counted per weeks-since-cohort — the standard retention matrix in
    // long form. Two shuffles: first-event min per user (broadcast back)
    // and the (cohort, week) distinct count.
    QueryDef(
      "q69_cohorts",
      """WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        |  FROM events GROUP BY user_id),
        |a AS (SELECT e.user_id, f.cw,
        |    date_diff('week', f.cw, date_trunc('week', e.ts)) AS wk
        |  FROM events e JOIN f ON f.user_id = e.user_id)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(wk AS INTEGER) AS weeks_since,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM a GROUP BY cw, wk ORDER BY cohort_week, weeks_since"""
        .stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events").select("user_id", "ts")
      val f = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      ev.join(broadcast(f), "user_id")
        .select(col("user_id"), col("cw"),
          (datediff(date_trunc("week", col("ts")), col("cw")) / 7)
            .cast("int").as("wk"))
        .groupBy("cw", "wk")
        .agg(countDistinct(col("user_id")).as("active_users"))
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("wk").as("weeks_since"), col("active_users"))
        .orderBy("cohort_week", "weeks_since")
    },

    // Distribution window functions: ntile / percent_rank / cume_dist /
    // nth_value — the ranking-family completion of q07/q08. All are
    // exact rationals computed in double (identical across engines);
    // total tiebreak order keeps them deterministic.
    QueryDef(
      "q70_window_suite",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  nth_value(o_orderkey, 2) OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_best
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).cast("int").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 2).over(wRows).as("second_best"))
        .orderBy("o_custkey", "o_orderkey")
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
    },

    // SCD2 change history: collapse each user's event stream to its
    // state-CHANGE points and build [valid_from, valid_to) validity
    // intervals (open interval = current state) — the temporal-
    // versioning view a lakehouse dimension table needs. Plan: ONE hash
    // partition on user_id reused by both windows (lag to find changes,
    // lead to close intervals) — no join, intermediate = |events|.
    QueryDef(
      "q73_scd2",
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_id, ts, event_type FROM o
        |  WHERE prev IS NULL OR event_type <> prev),
        |v AS (SELECT user_id, event_type AS state, ts,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS valid_to_ts
        |  FROM c)
        |SELECT user_id, state,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  valid_to_ts IS NULL AS is_current
        |FROM v ORDER BY user_id, valid_from, state""".stripMargin) {
      (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("event_type") =!= col("prev"))
        .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
        .select(col("user_id"),
          col("event_type").as("state"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "state")
    },

    // Distribution-drift monitoring (PSI): per event_type, the
    // population stability index of `value` between a reference window
    // (first half of the month) and the current window, over decile
    // bins of the REFERENCE distribution — the standard ML-monitoring
    // gate (PSI >= 0.2 ⇒ investigate). Bin edges are exact reference
    // deciles computed ENTIRELY IN INTEGER SPACE (values as micro-ints,
    // linear interpolation a·10 + (b−a)·rem in deci-micro units with
    // rem = (n−1)·k mod 10) — engine quantile builtins interpolate in
    // floating point and differ in the last ulp (measured at sf1:
    // DuckDB 59.759999… vs Spark 59.76 for the same decile), which
    // floor-snaps edges one micro-unit apart and shifts boundary rows
    // across bins. Binning is 1 + Σ(value·10 > edge), an integer
    // compare; bin fractions are Laplace-smoothed so empty bins
    // contribute finitely; per-bin terms round at 9 and sum in DECIMAL
    // (the q109 discipline), final PSI floor-scales. Plan: one ranked
    // pass over the reference (sorts within event_type partitions —
    // what any exact percentile costs), two point lookups per decile,
    // then ONE pass over each side with the 9-edge frame broadcast —
    // at 100 TB swap the exact deciles for approx_percentile and
    // everything downstream is unchanged.
    QueryDef(
      "q154_value_drift_psi", {
        val pivotSql = (1 to 9).map(k =>
          s"MAX(CASE k WHEN $k THEN edge10 END) AS d$k")
          .mkString(",\n        |    ")
        val binSql = (1 to 9).map(k =>
          s"CAST(vm * 10 > d$k AS INTEGER)").mkString("1 + ", " + ", "")
        s"""WITH ref AS (SELECT event_type,
           |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events
           |  WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL),
           |cur AS (SELECT event_type,
           |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events
           |  WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL),
           |rr AS (SELECT event_type, vm, ROW_NUMBER() OVER (
           |    PARTITION BY event_type ORDER BY vm) AS pos FROM ref),
           |rn AS (SELECT event_type, COUNT(*) AS n FROM ref GROUP BY 1),
           |ke AS (SELECT event_type, CAST(k AS INTEGER) AS k,
           |    (n - 1) * k // 10 + 1 AS lo, (n - 1) * k % 10 AS rem
           |  FROM rn, (SELECT unnest(range(1, 10)) AS k) t),
           |e1 AS (SELECT ke.event_type, ke.k,
           |    a.vm * 10 + (COALESCE(b.vm, a.vm) - a.vm) * ke.rem
           |      AS edge10
           |  FROM ke JOIN rr a ON a.event_type = ke.event_type
           |    AND a.pos = ke.lo
           |  LEFT JOIN rr b ON b.event_type = ke.event_type
           |    AND b.pos = ke.lo + 1),
           |ed AS (SELECT event_type,
           |    $pivotSql
           |  FROM e1 GROUP BY event_type),
           |rb AS (SELECT r.event_type, $binSql AS bin
           |  FROM ref r JOIN ed USING (event_type)),
           |cb AS (SELECT c.event_type, $binSql AS bin
           |  FROM cur c JOIN ed USING (event_type)),
           |rc AS (SELECT event_type, bin, COUNT(*) AS c FROM rb
           |  GROUP BY 1, 2),
           |cc AS (SELECT event_type, bin, COUNT(*) AS c FROM cb
           |  GROUP BY 1, 2),
           |rt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_ref
           |  FROM ref GROUP BY event_type),
           |ct AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cur
           |  FROM cur GROUP BY event_type),
           |grid AS (SELECT ed.event_type, CAST(i AS INTEGER) AS bin
           |  FROM ed, (SELECT unnest(range(1, 11)) AS i) t),
           |terms AS (SELECT g.event_type,
           |    (COALESCE(rc.c, 0) + 0.5) / (rt.n_ref + 5.0) AS p,
           |    (COALESCE(cc.c, 0) + 0.5) / (ct.n_cur + 5.0) AS q
           |  FROM grid g
           |  JOIN rt ON rt.event_type = g.event_type
           |  JOIN ct ON ct.event_type = g.event_type
           |  LEFT JOIN rc ON rc.event_type = g.event_type
           |    AND rc.bin = g.bin
           |  LEFT JOIN cc ON cc.event_type = g.event_type
           |    AND cc.bin = g.bin),
           |ps AS (SELECT event_type,
           |    floor(CAST(sum(CAST(round((p - q) * ln(p / q), 9)
           |      AS DECIMAL(28, 9))) AS DOUBLE) * 1000000) / 1000000.0
           |      AS psi
           |  FROM terms GROUP BY event_type)
           |SELECT ps.event_type, rt.n_ref, ct.n_cur, ps.psi,
           |  ps.psi >= 0.2 AS drifted
           |FROM ps JOIN rt ON rt.event_type = ps.event_type
           |JOIN ct ON ct.event_type = ps.event_type
           |ORDER BY ps.event_type""".stripMargin
      }) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 1000000).cast("long").as("vm"), col("ts"))
      val split = lit("2024-01-16").cast("timestamp")
      // Each side has three consumers (edges/bins/totals on ref, bins/
      // totals on cur): checkpoint the skinny 2-column frames once
      // instead of re-scanning events per consumer.
      val ref = ev.filter(col("ts") < split).drop("ts")
        .pinned
      val cur = ev.filter(col("ts") >= split).drop("ts")
        .pinned
      // exact deciles in INTEGER space: ranked micro-int values, edge =
      // a·10 + (b−a)·rem deci-micro units — no float interpolation (see
      // the SQL twin's comment; both engines compute identical longs)
      val rr = ref.withColumn("pos", row_number().over(
        Window.partitionBy("event_type").orderBy("vm")))
      val ke = ref.groupBy("event_type").agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          explode(sequence(lit(1), lit(9))).as("k"))
        .select(col("event_type"), col("k"),
          expr("(n - 1) * k div 10 + 1").as("lo"),
          expr("(n - 1) * k % 10").as("rem"))
      val a = rr.toDF("aet", "va", "pos")
      val b = rr.toDF("bet", "vb", "posb")
      val e1 = ke
        .join(a, col("aet") === col("event_type") &&
          col("pos") === col("lo"))
        .join(b, col("bet") === col("event_type") &&
          col("posb") === col("lo") + 1, "left")
        .select(col("event_type"), col("k"),
          (col("va") * 10 +
            (coalesce(col("vb"), col("va")) - col("va")) * col("rem"))
            .as("edge10"))
      val edAggs = (1 to 9).map(k =>
        max(when(col("k") === k, col("edge10"))).as(s"d$k"))
      val ed = broadcast(e1.groupBy("event_type")
        .agg(edAggs.head, edAggs.tail: _*))
      val bin = (1 to 9).map(k =>
        (col("vm") * 10 > col(s"d$k")).cast("int")).reduce(_ + _) + 1
      def binned(side: DataFrame) = side.join(ed, "event_type")
        .select(col("event_type"), bin.as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      val (rc, cc) = (binned(ref), binned(cur))
      val rt = ref.groupBy("event_type").agg(count(lit(1)).as("n_ref"))
      val ct = cur.groupBy("event_type").agg(count(lit(1)).as("n_cur"))
      val grid = ed.select(col("event_type"))
        .crossJoin(spark_range_bins(s))
      val terms = grid
        .join(broadcast(rt), "event_type")
        .join(broadcast(ct), "event_type")
        .join(rc, Seq("event_type", "bin"), "left")
        .join(cc.toDF("event_type", "bin", "c2"),
          Seq("event_type", "bin"), "left")
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          ((coalesce(col("c"), lit(0L)) + 0.5)
            / (col("n_ref") + 5.0)).as("p"),
          ((coalesce(col("c2"), lit(0L)) + 0.5)
            / (col("n_cur") + 5.0)).as("q"))
      terms
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          round((col("p") - col("q")) * log(col("p") / col("q")), 9)
            .cast(DecimalType(28, 9)).as("t"))
        .groupBy("event_type")
        .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
          (floor(sum("t").cast("double") * 1000000) / 1000000.0)
            .as("psi"))
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          col("psi"), (col("psi") >= 0.2).as("drifted"))
        .orderBy("event_type")
    },

    // Kolmogorov–Smirnov two-sample drift test per event_type — the
    // nonparametric companion to q154's binned PSI: D = sup |ECDF_ref −
    // ECDF_cur| over `value`, same ref/cur time windows. Everything up
    // to the final division is INTEGER arithmetic (D's numerator is
    // max |Cr·n_cur − Cc·n_ref| over the pooled distinct values, with
    // ties folded by grouping first), so both engines walk identical
    // numbers; the two float steps (one division, one sqrt for the
    // α=0.05 critical value 1.358·√((n+m)/nm)) are single
    // correctly-rounded IEEE ops, floor-scaled at the boundary. Scale
    // shape: one (type, value) pre-aggregate (map-side combined), one
    // per-type-partitioned running-sum window over DISTINCT values (far
    // smaller than the event stream), one max — no all-pairs, no
    // driver-side ECDFs. (Grouping is on the raw DOUBLE: fine for real
    // measurements like these; a corpus carrying NaN/-0.0 keys would
    // need a normalization step first, since engines may class them
    // differently.)
    QueryDef(
      "q161_value_drift_ks",
      """WITH ev AS (SELECT event_type, value,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS r
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type, value,
        |    CAST(sum(r) AS BIGINT) AS cr,
        |    CAST(sum(1 - r) AS BIGINT) AS cc
        |  FROM ev GROUP BY event_type, value),
        |t AS (SELECT event_type, CAST(sum(cr) AS BIGINT) AS n_ref,
        |    CAST(sum(cc) AS BIGINT) AS n_cur FROM g GROUP BY event_type),
        |c AS (SELECT event_type, value,
        |    sum(cr) OVER (PARTITION BY event_type ORDER BY value) AS f_r,
        |    sum(cc) OVER (PARTITION BY event_type ORDER BY value) AS f_c
        |  FROM g),
        |d AS (SELECT c.event_type,
        |    max(abs(f_r * t.n_cur - f_c * t.n_ref)) AS dnum
        |  FROM c JOIN t USING (event_type) GROUP BY c.event_type)
        |SELECT t.event_type, t.n_ref, t.n_cur,
        |  floor(dnum / CAST(t.n_ref * t.n_cur AS DOUBLE) * 1000000)
        |    / 1000000.0 AS ks_stat,
        |  floor(1.358 * sqrt((t.n_ref + t.n_cur)
        |      / CAST(t.n_ref * t.n_cur AS DOUBLE)) * 1000000)
        |    / 1000000.0 AS crit_05,
        |  floor(dnum / CAST(t.n_ref * t.n_cur AS DOUBLE) * 1000000)
        |      / 1000000.0
        |    > floor(1.358 * sqrt((t.n_ref + t.n_cur)
        |      / CAST(t.n_ref * t.n_cur AS DOUBLE)) * 1000000)
        |      / 1000000.0 AS drifted
        |FROM d JOIN t USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val split = lit("2024-01-16").cast("timestamp")
      val g = Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"),
          when(col("ts") < split, 1L).otherwise(0L).as("r"))
        .groupBy("event_type", "value")
        .agg(sum(col("r")).as("cr"), sum(lit(1L) - col("r")).as("cc"))
      val t = g.groupBy("event_type")
        .agg(sum("cr").as("n_ref"), sum("cc").as("n_cur"))
      val w = Window.partitionBy("event_type").orderBy("value")
      val d = g
        .select(col("event_type"),
          sum("cr").over(w).as("f_r"), sum("cc").over(w).as("f_c"))
        .join(broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(max(abs(col("f_r") * col("n_cur")
          - col("f_c") * col("n_ref"))).as("dnum"))
      val nm = (col("n_ref") * col("n_cur")).cast("double")
      val ks = floor(col("dnum") / nm * 1000000) / 1000000.0
      val crit = floor(lit(1.358)
        * sqrt((col("n_ref") + col("n_cur")) / nm) * 1000000) / 1000000.0
      d.join(broadcast(t), "event_type")
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          ks.as("ks_stat"), crit.as("crit_05"), (ks > crit).as("drifted"))
        .orderBy("event_type")
    },

    // Robust outlier detection per event_type: the median/MAD modified
    // z-score (Iglewicz–Hoaglin, |0.6745·(x−med)/MAD| > 3.5) — the
    // data-quality gate that survives exactly the outliers it hunts
    // (mean/stddev z-scores are dragged by the tail they should flag).
    // Two percentile aggregates (median, then median absolute
    // deviation via a broadcast rejoin — the q154 exact-percentile
    // discipline, floor-scaled at the boundary), then one row-local
    // scoring pass; per-type medians are bounded metadata, the corpus
    // is scanned three times and shuffled never.
    QueryDef(
      "q166_robust_outliers",
      """WITH ev AS (SELECT event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |md AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5) * 1000000) / 1000000.0
        |      AS med
        |  FROM ev GROUP BY event_type),
        |dv AS (SELECT ev.event_type, abs(ev.value - md.med) AS dev
        |  FROM ev JOIN md USING (event_type)),
        |md2 AS (SELECT event_type,
        |    round(quantile_cont(dev, 0.5) * 1000000) / 1000000.0 AS mad
        |  FROM dv GROUP BY event_type),
        |sc AS (SELECT ev.event_type,
        |    CASE WHEN md2.mad > 0 AND
        |      abs(0.6745 * (ev.value - md.med) / md2.mad) > 3.5
        |      THEN 1 ELSE 0 END AS is_out
        |  FROM ev JOIN md USING (event_type)
        |  JOIN md2 USING (event_type))
        |SELECT sc.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(md.med) AS median_v, max(md2.mad) AS mad_v,
        |  CAST(sum(is_out) AS BIGINT) AS n_outliers
        |FROM sc JOIN md USING (event_type) JOIN md2 USING (event_type)
        |GROUP BY sc.event_type ORDER BY sc.event_type""".stripMargin) {
      (s, dir) =>
      val ev = Tables(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      val md = broadcast(ev.groupBy("event_type").agg(
        (round(expr("percentile(value, 0.5)") * 1000000) / 1000000.0)
          .as("med")))
      val md2 = broadcast(ev.join(md, "event_type")
        .select(col("event_type"),
          abs(col("value") - col("med")).as("dev"))
        .groupBy("event_type").agg(
          (round(expr("percentile(dev, 0.5)") * 1000000) / 1000000.0)
            .as("mad")))
      ev.join(md, "event_type").join(md2, "event_type")
        .select(col("event_type"), col("med"), col("mad"),
          when(col("mad") > 0 &&
            abs(lit(0.6745) * (col("value") - col("med")) / col("mad"))
              > 3.5, 1L).otherwise(0L).as("is_out"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("med").as("median_v"),
          max("mad").as("mad_v"), sum("is_out").as("n_outliers"))
        .orderBy("event_type")
    },

    // Sequential-pattern support (sequence-mining tier): for every
    // ORDERED event-type pair (a ≺ b), how many users did a strictly
    // before ever doing b — the support table behind funnel discovery
    // (q68 checks ONE fixed pattern; this surfaces which patterns are
    // worth checking). Scale shape: the corpus collapses to one
    // (user, type) → first-occurrence aggregate (map-side combined);
    // the pair join runs on users × |types| rows against themselves
    // PER USER — bounded by |types|² per user, never events². First
    // occurrences make support well-defined under repeats (standard
    // sequential-pattern semantics); ties at identical timestamps break
    // by event_id, so "strictly before" is total.
    QueryDef(
      "q181_sequence_support",
      """WITH f AS (SELECT user_id, event_type,
        |    min(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
        |      lpad(CAST(event_id AS VARCHAR), 14, '0')) AS ord
        |  FROM events GROUP BY user_id, event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM f a JOIN f b ON b.user_id = a.user_id
        |    AND a.event_type <> b.event_type AND a.ord < b.ord
        |  GROUP BY a.event_type, b.event_type)
        |SELECT type_a, type_b, n_users FROM p
        |ORDER BY type_a, type_b""".stripMargin) { (s, dir) =>
      val f = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          // fixed-width zero-padded (ts, id) key: lexicographic order ==
          // numeric order, so min() picks the true first occurrence
          concat(lpad(unix_micros(col("ts").cast("timestamp"))
            .cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 14, "0")).as("o"))
        .groupBy("user_id", "event_type")
        .agg(min("o").as("ord"))
      f.toDF("user_id", "type_a", "ord_a")
        .join(f.toDF("user_id", "type_b", "ord_b"), "user_id")
        .filter(col("type_a") =!= col("type_b") &&
          col("ord_a") < col("ord_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("type_a", "type_b")
    },

    // First-order Markov transition matrix of user behavior: counts and
    // probabilities of each consecutive event-type transition within a
    // user's stream (ordered by event time, ties broken by event_id —
    // a total order, so both engines pair identical neighbors). The
    // behavioral model behind next-event prediction and anomaly scoring
    // ("this session's transitions are improbable"). One lead window
    // per user (single hash partition by user_id), one (from, to)
    // aggregate; probabilities are exact counts divided once,
    // floor-scaled.
    QueryDef(
      "q182_markov_transitions",
      """WITH s AS (SELECT user_id, event_type AS t_from,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t_to
        |  FROM events),
        |c AS (SELECT t_from, t_to, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE t_to IS NOT NULL GROUP BY t_from, t_to),
        |r AS (SELECT t_from, CAST(sum(n) AS BIGINT) AS row_n FROM c
        |  GROUP BY t_from)
        |SELECT c.t_from, c.t_to, c.n,
        |  floor(c.n / CAST(r.row_n AS DOUBLE) * 1000000) / 1000000.0
        |    AS p
        |FROM c JOIN r ON r.t_from = c.t_from
        |ORDER BY c.t_from, c.t_to""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val c = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type").as("t_from"),
          lead("event_type", 1).over(w).as("t_to"))
        .filter(col("t_to").isNotNull)
        .groupBy("t_from", "t_to").agg(count(lit(1)).as("n"))
      val r = c.groupBy("t_from").agg(sum("n").as("row_n"))
      c.join(broadcast(r), "t_from")
        .select(col("t_from"), col("t_to"), col("n"),
          (floor(col("n") / col("row_n").cast("double") * 1000000)
            / 1000000.0).as("p"))
        .orderBy("t_from", "t_to")
    },

    // Behavioral anomaly scoring under the q182 Markov model: each
    // user's mean transition log-likelihood, flagged when it falls
    // below the population's 5th percentile — "this user's event stream
    // is improbable under how users behave", the sequence-level
    // complement to q166's value-level outliers. Determinism: the
    // model's probabilities are q182's floor-scaled values, log is one
    // IEEE op on identical doubles, per-user sums go through the
    // round-9/decimal discipline (double summation order is the enemy),
    // and — because the per-user means are floor-scaled onto the
    // micro-grid — the 5th-percentile threshold interpolates EXACTLY in
    // integer space (micro-int values, a·20 + (b−a)·((n−1) mod 20) in
    // ×20 units; engine quantile builtins interpolate 0.05 in floating
    // point and can snap the threshold one micro-unit off, flipping
    // grid-adjacent users — the q154 defect class). The model re-enters
    // as a broadcast; scoring is one windowed pass + one join.
    QueryDef(
      "q183_markov_anomaly",
      """WITH s AS (SELECT user_id, event_type AS t_from,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t_to
        |  FROM events),
        |tr AS (SELECT user_id, t_from, t_to FROM s
        |  WHERE t_to IS NOT NULL),
        |c AS (SELECT t_from, t_to, count(*) AS n FROM tr
        |  GROUP BY t_from, t_to),
        |r AS (SELECT t_from, sum(n) AS row_n FROM c GROUP BY t_from),
        |m AS (SELECT c.t_from, c.t_to,
        |    floor(c.n / CAST(r.row_n AS DOUBLE) * 1000000) / 1000000.0
        |      AS p
        |  FROM c JOIN r ON r.t_from = c.t_from),
        |u AS (SELECT tr.user_id, CAST(count(*) AS BIGINT) AS n_trans,
        |    floor(CAST(SUM(CAST(round(ln(m.p), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) / count(*) * 1000000) / 1000000.0
        |      AS mean_loglik
        |  FROM tr JOIN m ON m.t_from = tr.t_from AND m.t_to = tr.t_to
        |  GROUP BY tr.user_id),
        |uu AS (SELECT user_id, n_trans, mean_loglik,
        |    CAST(round(mean_loglik * 1000000) AS BIGINT) AS um FROM u),
        |ru AS (SELECT um AS v, ROW_NUMBER() OVER (ORDER BY um) AS pos
        |  FROM uu),
        |kt AS (SELECT (n - 1) // 20 + 1 AS lo, (n - 1) % 20 AS rem
        |  FROM (SELECT COUNT(*) AS n FROM uu) t),
        |th AS (SELECT a.v * 20 + (COALESCE(b.v, a.v) - a.v) * kt.rem
        |    AS thr20
        |  FROM kt JOIN ru a ON a.pos = kt.lo
        |  LEFT JOIN ru b ON b.pos = kt.lo + 1)
        |SELECT uu.user_id, uu.n_trans, uu.mean_loglik,
        |  uu.um * 20 < th.thr20 AS anomalous
        |FROM uu, th ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type").as("t_from"),
          lead("event_type", 1).over(w).as("t_to"))
        .filter(col("t_to").isNotNull)
      val c = tr.groupBy("t_from", "t_to").agg(count(lit(1)).as("n"))
      val r = c.groupBy("t_from").agg(sum("n").as("row_n"))
      val m = c.join(r, "t_from")
        .select(col("t_from"), col("t_to"),
          (floor(col("n") / col("row_n").cast("double") * 1000000)
            / 1000000.0).as("p"))
      val u = tr.join(broadcast(m), Seq("t_from", "t_to"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_trans"),
          (floor(sum(round(log(col("p")), 9).cast(DecimalType(28, 9)))
            .cast("double") / count(lit(1)) * 1000000) / 1000000.0)
            .as("mean_loglik"))
        .withColumn("um", round(col("mean_loglik") * 1000000)
          .cast("long"))
        .pinned
      // exact 5th-percentile edge via the distributed rank-select
      // ([[ExactRank.valuesAt]]): the threshold needs TWO positions of
      // the sorted per-user means, so read exactly those off the
      // range-partitioned sort (pinpoint filter) instead of projecting
      // a rank onto every user and joining back down — same (v, pos)
      // pairs as a global row_number window, none of its
      // move-every-user-into-one-task funnel, and the ×20
      // interpolation is the oracle's exact integer arithmetic on the
      // collected longs, entering the final pass as a literal.
      val (nU, vals) = graft.engine.ExactRank.valuesAt(
        u.select(col("um")), "um",
        n => { val lo = (n - 1) / 20 + 1; Seq(lo, lo + 1) })
      val lo = (nU - 1) / 20 + 1
      val rem = (nU - 1) % 20
      // empty input: no positions collected — any literal serves, the
      // final select over the empty frame is empty either way (the
      // former join-based edge computation also yielded empty)
      val va = vals.getOrElse(lo, 0L)
      val thr20 = va * 20 + (vals.getOrElse(lo + 1, va) - va) * rem
      u.select(col("user_id"), col("n_trans"), col("mean_loglik"),
          (col("um") * 20 < lit(thr20)).as("anomalous"))
        .orderBy("user_id")
    },

    // Time-to-conversion distribution — the product-analytics measure
    // q68's funnel counts don't carry: for users who purchase at or
    // after their first view, the view→purchase latency's exact
    // p50/p90 plus the conversion rate. Lags are INTEGER seconds
    // (floor-divided epoch micros — identical integer arithmetic in
    // both engines, no interval semantics to disagree on); the two
    // percentile evaluations run over the converted-users frame
    // (users-sized, not events-sized).
    QueryDef(
      "q188_time_to_convert",
      """WITH v AS (SELECT user_id, min(ts) AS vt FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS pt
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.vt
        |  GROUP BY e.user_id),
        |l AS (SELECT v.user_id,
        |    (epoch_us(p.pt) - epoch_us(v.vt)) // 1000000 AS lag_s
        |  FROM v JOIN p USING (user_id))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewers,
        |  CAST(count(*) AS BIGINT) AS n_converted,
        |  floor(count(*) / CAST((SELECT count(*) FROM v) AS DOUBLE)
        |    * 1000000) / 1000000.0 AS conversion_rate,
        |  round(quantile_cont(lag_s, 0.5) * 1000000) / 1000000.0
        |    AS p50_s,
        |  round(quantile_cont(lag_s, 0.9) * 1000000) / 1000000.0
        |    AS p90_s
        |FROM l""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("vt"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") >= col("vt"))
        .groupBy("user_id").agg(min("ts").as("pt"))
      val l = v.join(p, "user_id")
        .select(expr("(unix_micros(pt) - unix_micros(vt)) " +
          "div 1000000").as("lag_s"))
      val nv = v.agg(count(lit(1)).as("n_viewers"))
      l.agg(count(lit(1)).as("n_converted"),
          (round(expr("percentile(lag_s, 0.5)") * 1000000)
            / 1000000.0).as("p50_s"),
          (round(expr("percentile(lag_s, 0.9)") * 1000000)
            / 1000000.0).as("p90_s"))
        .crossJoin(broadcast(nv))
        .select(col("n_viewers"), col("n_converted"),
          (floor(col("n_converted")
            / col("n_viewers").cast("double") * 1000000) / 1000000.0)
            .as("conversion_rate"),
          col("p50_s"), col("p90_s"))
    })

  /** The dense 1..10 bin spine for the PSI grid. */
  private def spark_range_bins(s: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import s.implicits._
    (1 to 10).toDF("bin")
  }

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
