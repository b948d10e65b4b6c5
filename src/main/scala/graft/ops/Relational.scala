package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.engine.Tables

/** Gold-layer relational surface (SURVEY.md §2.3-§2.8, §7.2 M1).
  *
  * The reference itself has no joins/groupBys (SURVEY §2.3/§2.4) — its
  * union+key design implies a queryable silver table, and these are the
  * gold queries over it, expressed on the driver's TPC-H-ish tables.
  *
  * Oracle-determinism rules (SURVEY §7.4): every query ends in a total
  * ORDER BY; float sums go through exact DECIMAL accumulation and are cast
  * to double only at the end (identical decimal in both engines → identical
  * double); ratios are computed in double from exact inputs (IEEE division
  * is deterministic); timestamps cross the boundary as formatted strings.
  *
  * Scale notes (100 TB): dimension joins are broadcast explicitly; fact-fact
  * joins shuffle on their join keys and rely on AQE for skew; every scan
  * projects only needed columns so parquet pushdown/pruning engages.
  */
object Relational {

  /** Exact decimal sum of a 2-decimal double column, surfaced as double. */
  private def dsum(c: Column, p: Int = 18): Column =
    sum(c.cast(DecimalType(p, 2))).cast("double")

  /** Exact revenue term: price * (1 - discount) in decimal. */
  private def revTerm(price: Column, disc: Column): Column =
    price.cast(DecimalType(18, 2)) * (lit(1) - disc.cast(DecimalType(4, 2)))

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  val defs: Seq[QueryDef] = Seq(

    // S1/P-series: scan + filter + projection, pushed to parquet.
    QueryDef(
      "q01_scan_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_returnflag""".stripMargin) { (s, dir) =>
      // ORDER BY every output column: (l_orderkey, l_linenumber) is NOT
      // unique in the synthetic corpus, and a non-total order leaves
      // tie order engine-dependent (rows only coincidentally aligned in
      // file order — diverged at the sf1 sweep). Under the full-row
      // order, equal rows are interchangeable and the compare is
      // well-defined at any scale.
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
    },

    // A-series: TPC-H Q1-style grouped aggregation (map-side partials).
    QueryDef(
      "q02_agg_group",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         |  CAST(SUM($revSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum(revTerm(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Broadcast join: small dim (part) to fact (lineitem).
    QueryDef(
      "q03_join_broadcast",
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select("l_partkey", "l_quantity")
      val p = Tables(s, dir, "part").select("p_partkey", "p_brand")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    },

    // Multi-way join: fact-fact shuffle join + broadcast dims (Q5-style).
    QueryDef(
      "q04_join_multi",
      s"""SELECT n_name, r_name, COUNT(*) AS n_lines,
         |  CAST(SUM($revSql) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name, r_name
         |ORDER BY n_name, r_name""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val n = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(count(lit(1)).as("n_lines"),
          sum(revTerm(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("n_name", "r_name")
    },

    // Left-semi join (EXISTS).
    QueryDef(
      "q05_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select("c_custkey", "c_name")
      val big = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 300000).select("o_custkey")
      c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .orderBy("c_custkey")
    },

    // Left-anti join (NOT EXISTS).
    QueryDef(
      "q06_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select("c_custkey", "c_name")
      val p = Tables(s, dir, "orders")
        .filter(col("o_orderstatus") === "P").select("o_custkey")
      c.join(p, col("c_custkey") === col("o_custkey"), "left_anti")
        .orderBy("c_custkey")
    },

    // Window ranking: top-3 orders per customer.
    QueryDef(
      "q07_window_rank",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // Window frames: running sum + lag per supplier, deterministic total order.
    QueryDef(
      "q08_window_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev,
        |  LAG(l_extendedprice) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_price
        |FROM lineitem
        |WHERE l_suppkey < 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_suppkey").orderBy(ord: _*)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "lineitem")
        .filter(col("l_suppkey") < 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).over(wf)
            .cast("double").as("running_rev"),
          lag(col("l_extendedprice"), 1).over(w).as("prev_price"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Sort + limit (top-K) with unique tiebreaker.
    QueryDef(
      "q09_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Distinct.
    QueryDef(
      "q10_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Set operations: intersect then except.
    QueryDef(
      "q11_setops",
      """SELECT nk FROM (
        |  (SELECT n_nationkey AS nk FROM nation
        |   INTERSECT SELECT c_nationkey FROM customer)
        |  EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000)
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      val n = Tables(s, dir, "nation").select(col("n_nationkey").as("nk"))
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = Tables(s, dir, "supplier")
        .filter(col("s_acctbal") > 8000).select(col("s_nationkey").as("nk"))
      n.intersect(c).except(su).orderBy("nk")
    },

    // Union-by-name across heterogeneous sources (SURVEY §2.7 U1 shape).
    QueryDef(
      "q12_union_by_name",
      """SELECT 'customer' AS src, c_name AS name, c_nationkey AS nationkey,
        |       c_acctbal AS acctbal
        |FROM customer
        |UNION ALL
        |SELECT 'supplier' AS src, s_name AS name, s_nationkey AS nationkey,
        |       s_acctbal AS acctbal
        |FROM supplier
        |ORDER BY src, name""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select(
        lit("customer").as("src"), col("c_name").as("name"),
        col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"))
      val su = Tables(s, dir, "supplier").select(
        lit("supplier").as("src"), col("s_name").as("name"),
        col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"))
      c.unionByName(su).orderBy("src", "name")
    },

    // ROLLUP grouping sets (grouping nulls coalesced → no null-order skew).
    QueryDef(
      "q13_rollup",
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"), col("n"))
        .orderBy("returnflag", "linestatus")
    },

    // CUBE grouping sets.
    QueryDef(
      "q14_cube",
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // Exact distinct-count aggregation.
    QueryDef(
      "q15_count_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    },

    // Scalar functions: CASE, string ops (SURVEY §2.8 family).
    QueryDef(
      "q16_case_string",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  UPPER(SUBSTRING(o_orderpriority, 1, 5)) AS pri5,
        |  CONCAT_WS('-', o_orderstatus, o_orderpriority) AS tag,
        |  LENGTH(o_orderpriority) AS prilen
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("bucket"),
        upper(substring(col("o_orderpriority"), 1, 5)).as("pri5"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        length(col("o_orderpriority")).as("prilen"))
        .orderBy("o_orderkey")
    },

    // Date/time extraction + grouping.
    QueryDef(
      "q17_datetime",
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS y,
        |       CAST(MONTH(o_orderdate) AS INTEGER) AS m,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("y", "m")
    },

    // JSON extraction from the events.props payload (schema-on-read).
    QueryDef(
      "q18_json",
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    },

    // Event-time tumbling window, batch shape (streaming analog in specs).
    QueryDef(
      "q19_event_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("hour_start", "event_type")
    },

    // Range (non-equi) join: equi key + date-band condition.
    QueryDef(
      "q20_range_join",
      """SELECT o_orderstatus, COUNT(*) AS n_in_window
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      val o = Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_in_window"))
        .orderBy("o_orderstatus")
    },

    // Scalar subquery: customers above mean balance (exact-decimal mean).
    QueryDef(
      "q21_above_avg",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select("c_custkey", "c_acctbal")
      val avgDf = c.agg(
        (dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      c.join(broadcast(avgDf), col("c_acctbal") > col("avg_bal"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Full-outer join — the reconciliation primitive (which keys exist
    // on which side, with per-side aggregates and a presence verdict).
    // Thresholds chosen so BOTH sides have unmatched keys at every scale
    // factor. Two pre-aggregated sides (25 rows each) meet in a tiny
    // shuffle; at scale the pattern holds because both inputs reduce to
    // per-key aggregates BEFORE the join — never a full-outer of raw
    // fact tables.
    QueryDef(
      "q88_full_outer",
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
        |  FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
        |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp,
        |  CASE WHEN c.nk IS NULL THEN 'supp_only'
        |       WHEN s.nk IS NULL THEN 'cust_only' ELSE 'both' END AS side
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nk"""
        .stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("c_nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("s_nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nk") === col("s_nk"), "full_outer")
        .select(coalesce(col("c_nk"), col("s_nk")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          when(col("c_nk").isNull, "supp_only")
            .when(col("s_nk").isNull, "cust_only")
            .otherwise("both").as("side"))
        .orderBy("nk")
    },

    // Record re-serialization to JSON (reference F7/F8 raw_json pattern,
    // bronze_assets_to_silver_assets.py:133-136) as a gold query.
    // Null-free columns only: Spark drops null fields, DuckDB emits them.
    QueryDef(
      "q25_to_json",
      """SELECT n_nationkey,
        |  to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name))
        |    AS rec
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "nation").select(
        col("n_nationkey"),
        to_json(struct(col("n_nationkey"), col("n_name"))).as("rec"))
        .orderBy("n_nationkey")
    },

    // Approximate distinct counting (HLL) — the mergeable at-scale path
    // for COUNT(DISTINCT). Sketch estimates differ across engines, so the
    // estimate itself can't hash-match an oracle; instead (q66's sketch
    // pattern) the plan computes BOTH the HLL estimate and the exact
    // distinct count and ships the exact counts plus the sketch's
    // relative-error verdict: default rsd = 0.05, asserted at 3σ = 15%.
    // DuckDB reproduces the booleans as literal TRUE — a hash mismatch
    // means the sketch broke its bound. The exact side is the audit cost,
    // paid here to make the sketch's accuracy part of the artifact; the
    // production form at 100 TB drops it and keeps only the HLL partials.
    QueryDef(
      "q26_approx_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_ok, TRUE AS orders_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey")).as("ao"))
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.15).as("parts_ok"),
          (abs(col("ao") - col("exact_orders")).cast("double") /
            col("exact_orders") <= 0.15).as("orders_ok"))
        .orderBy("l_returnflag")
    },

    // Deterministic surrogate key: sha2 ⊕ concat_ws ⊕ lower ⊕ trim
    // (reference F4-F6, bronze_assets_to_silver_assets.py:138-149).
    QueryDef(
      "q22_uid_hash",
      """SELECT c_custkey,
        |  sha256(concat_ws('|', lower(trim(c_name)), CAST(c_nationkey AS VARCHAR),
        |                   c_mktsegment)) AS uid
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").select(
        col("c_custkey"),
        sha2(concat_ws("|", lower(trim(col("c_name"))),
          col("c_nationkey").cast("string"), col("c_mktsegment")), 256)
          .as("uid"))
        .orderBy("c_custkey")
    },

    // Pivot: long → wide on a FIXED value list (explicit values keep the
    // output schema static, which is what makes the plan one pass — Spark
    // without the list runs an extra distinct job to discover columns,
    // a scan you don't want at 100 TB). Absent cells coalesce to 0 so the
    // contract matches the oracle's FILTERed counts.
    QueryDef(
      "q28_pivot", {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val cols = types.map(t =>
          s"COUNT(*) FILTER (event_type = '$t') AS $t").mkString(",\n        |  ")
        s"""SELECT CAST(ts AS DATE) AS day,
           |  $cols
           |FROM events GROUP BY 1 ORDER BY day""".stripMargin
      }) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("event_type"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    },

    // Grouping sets — the general form rollup/cube (q13/q14) specialize:
    // per-status totals, per-priority totals, and the grand total in ONE
    // pass (Expand + single shuffle, not three scans unioned). NULLS
    // FIRST pinned in the oracle: Spark's asc default is nulls-first,
    // DuckDB's is nulls-last.
    QueryDef(
      "q29_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Moment-based statistics: variance / stddev / covariance / Pearson
    // correlation from EXACT decimal power sums (sum x, x², y, y², xy).
    // The built-in stddev/corr aggregates stream Welford updates whose
    // double rounding depends on partition merge order — fine numerically,
    // but not reproducible bit-for-bit across engines or even across two
    // runs with different partitioning. Decimal moments are exact and
    // commutative, so the derived doubles are deterministic at any scale
    // and any partition count; the classic cancellation caveat of the
    // power-sum formula doesn't bite because the inputs are exact.
    QueryDef(
      "q39_stats",
      """WITH m AS (SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(CAST(sx AS DOUBLE) / n, 6) AS mean_qty,
        |  round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |    / (n - 1), 6) AS var_qty,
        |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |    / (n - 1)), 6) AS std_qty,
        |  round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
        |    / (n - 1), 6) AS covar_qty_price,
        |  round(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1))
        |    / (sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))
        |     * sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1))),
        |    6) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val dec = (c: String) => col(c).cast(DecimalType(18, 2))
      val m = Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec("l_quantity")).as("sx"),
          sum(dec("l_quantity") * dec("l_quantity")).as("sxx"),
          sum(dec("l_extendedprice")).as("sy"),
          sum(dec("l_extendedprice") * dec("l_extendedprice")).as("syy"),
          sum(dec("l_quantity") * dec("l_extendedprice")).as("sxy"))
      val n = col("n")
      val dbl = (c: String) => col(c).cast("double")
      val varX = (dbl("sxx") - dbl("sx") * dbl("sx") / n) / (n - 1)
      val varY = (dbl("syy") - dbl("sy") * dbl("sy") / n) / (n - 1)
      val covar = (dbl("sxy") - dbl("sx") * dbl("sy") / n) / (n - 1)
      m.select(col("l_returnflag"), n,
        round(dbl("sx") / n, 6).as("mean_qty"),
        round(varX, 6).as("var_qty"),
        round(sqrt(varX), 6).as("std_qty"),
        round(covar, 6).as("covar_qty_price"),
        round(covar / (sqrt(varX) * sqrt(varY)), 6).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },

    // Unpivot (wide → long melt), the inverse of q28: fixed metric columns
    // become (metric, val) rows — a per-row Expand, no shuffle at all.
    QueryDef(
      "q58_unpivot",
      """SELECT o_orderkey, metric, val FROM (
        |  SELECT o_orderkey, 'custkey' AS metric,
        |    CAST(o_custkey AS DOUBLE) AS val FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'totalprice',
        |    CAST(o_totalprice AS DOUBLE) FROM orders) t
        |ORDER BY o_orderkey, metric""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_custkey").cast("double").as("custkey"),
          col("o_totalprice").cast("double").as("totalprice"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("custkey"), col("totalprice")), "metric", "val")
        .orderBy("o_orderkey", "metric")
    },

    // Exact percentiles (median / p90 with linear interpolation — the
    // same definition as SQL PERCENTILE_CONT, DuckDB quantile_cont).
    // Exact percentile needs a per-group sort; the approximate twin for
    // 100 TB is approx_percentile (t-digest-family sketch, mergeable
    // map-side like any aggregate) — registered rows-only as q26 is for
    // HLL, with THIS query as its exactness oracle.
    QueryDef(
      "q59_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"))
        .orderBy("l_returnflag")
    },

    // Sketch-based percentiles — the at-scale path (mergeable partial
    // aggregation, no per-group sort). Sketch internals differ across
    // engines, so the sketch VALUES can't hash-match an oracle; instead
    // the query asserts the sketch's accuracy bound against the exact
    // percentile (q59's definition) inside the plan and ships the
    // verdict: approx_percentile(accuracy=10000) guarantees rank error
    // ≤ n/10000 (~2 ranks at sf0.01), which on 1..50-quantity data means
    // |approx - exact| ≤ 1. DuckDB reproduces the booleans as literal
    // TRUE — a hash mismatch means the sketch broke its bound.
    QueryDef(
      "q66_approx_percentiles",
      """SELECT l_returnflag, count(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, array(0.5, 0.9), 10000)")
            .as("ap"),
          expr("percentile(l_quantity, 0.5)").as("ep50"),
          expr("percentile(l_quantity, 0.9)").as("ep90"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          (abs(element_at(col("ap"), 1) - col("ep50")) <= 1.0).as("p50_ok"),
          (abs(element_at(col("ap"), 2) - col("ep90")) <= 1.0).as("p90_ok"))
        .orderBy("l_returnflag")
    },

    // Edit-distance near-dup: Levenshtein over document prefixes on a
    // capped id range — the character-level fuzzy-match primitive
    // (MinHash/SimHash are token-level; OCR-noise and small-edit dups
    // need character granularity). The all-pairs form is the exactness
    // oracle; the scale path blocks by SimHash/LSH bucket first and runs
    // this only within buckets.
    QueryDef(
      "q63_edit_distance",
      """WITH d AS (SELECT doc_id, substr(text, 1, 80) AS p
        |  FROM documents WHERE doc_id < 300)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(levenshtein(a.p, b.p) AS INTEGER) AS dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 40
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), substring(col("text"), 1, 80).as("p"))
      // The non-equi pair join is a BroadcastNestedLoopJoin whose output
      // parallelism is the STREAM side's partitioning — and a 300-row
      // filtered scan arrives as one partition, which would run every
      // Levenshtein on a single core. Spread the stream side first —
      // width derived from the session's shuffle parallelism, never a
      // literal, so a 1000-executor cluster spreads the DP stage fully.
      d.toDF("a_id", "pa")
        .repartition(s.sessionState.conf.numShufflePartitions, col("a_id"))
        .join(d.toDF("b_id", "pb"), col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("pa"), col("pb")).cast("int").as("dist"))
        .filter(col("dist") <= 40)
        .orderBy("a_id", "b_id")
    },

    // Time-series gap fill: dense hourly spine (sequence + explode; the
    // spine generator is one row per bound pair, so no data shuffle) left
    // joined to observed per-hour aggregates — missing hours surface as
    // explicit zero rows, the shape every downstream window/trend
    // computation needs. Restricted to one event_type to keep a visible
    // gap rate.
    QueryDef(
      "q64_gapfill",
      """WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
        |    date_trunc('hour', MAX(ts)) AS hi
        |  FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi,
        |    INTERVAL 1 HOUR)) AS hour_start FROM b),
        |obs AS (SELECT date_trunc('hour', ts) AS hour_start,
        |    COUNT(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT strftime(s.hour_start, '%Y-%m-%d %H:%M:%S') AS hour_s,
        |  COALESCE(o.n, 0) AS n
        |FROM spine s LEFT JOIN obs o ON o.hour_start = s.hour_start
        |ORDER BY hour_s""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val spine = ev
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(expr("sequence(lo, hi, INTERVAL 1 HOUR)"))
          .as("hour_start"))
      val obs = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
        .agg(count(lit(1)).as("n"))
      spine.join(obs, Seq("hour_start"), "left")
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_s"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("hour_s")
    },

    // Semi-structured columns via Spark 4 VARIANT: parse_json ONCE into
    // the shredded binary encoding, then typed variant_get extraction —
    // at 100 TB this replaces a full JSON string re-parse per accessed
    // field (get_json_object, q18's shape) with one decode feeding any
    // number of typed reads. The oracle is the string-JSON computation:
    // both paths must agree exactly.
    QueryDef(
      "q75_variant",
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(json_extract_string(props, '$.k')
        |    AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
        |    AS INTEGER) AS max_k
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // Top-3 orders per customer through the CUSTOM PHYSICAL OPERATOR
    // ([[graft.plans.TopKPerKey]]: logical node → strategy → two-phase
    // bounded-heap exec) — the full custom-plan tier of the extension
    // ladder, exercised on the oracle surface. Spark 4's built-in
    // WindowGroupLimit rewrite already bounds the rank-filter window
    // form's shuffle, but both its phases still FULLY SORT their input
    // partitions below the limit; the custom operator replaces the
    // sorts with bounded per-key heaps (O(n log k), no sort buffer).
    // Result sets are identical because the caller supplies a total
    // order (totalprice DESC, orderkey ASC); TopKPerKeySpec pins
    // row-set identity, the two-phase plan shape, and k-boundary ties.
    QueryDef(
      "q177_topk_operator",
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) {
      (s, dir) =>
      graft.plans.TopKPerKey(
        Tables(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey",
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc,
          col("o_orderkey"))
    })
}
