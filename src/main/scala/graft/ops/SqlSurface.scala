package graft.ops

import graft.QueryDef
import graft.engine.SqlEntry

/** SQL-text entry surface (round-5 verdict, "What's missing" 2): each
  * query here is ONE SQL string in the ANSI intersection of Spark SQL
  * and DuckDB, run verbatim by BOTH engines — the Spark side through
  * [[graft.engine.SqlEntry]] over the registered corpus views, the
  * oracle side by the driver's DuckDB. Shared text means zero drift by
  * construction, and it proves the reference's "immediately queryable by
  * Spark, Trino, or BI" promise (reference README.md:42) holds: a BI
  * user's first interaction is SQL, and this is that interaction,
  * oracle-checked.
  *
  * Determinism rules are the usual ones (SURVEY §7.4): total ORDER BY,
  * DECIMAL accumulation for float sums, integer/string outputs
  * otherwise.
  */
object SqlSurface {

  private def shared(name: String)(text: String): QueryDef =
    QueryDef(name, text)((s, dir) => SqlEntry.sql(s, dir, text))

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-style pricing summary — the canonical BI aggregate, as
    // pure SQL text. Decimal-accumulated sums; plan identical to q02's
    // DataFrame build (scan → partial hash agg → final agg).
    shared("q122_sql_pricing")(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS sum_disc_price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Join + window top-N per customer — the "BI drill-down" shape
    // (dimension join, partitioned rank, k-per-group), as SQL text. The
    // customer side broadcasts (AQE sizes it); the window partitions by
    // customer — no global sort.
    shared("q123_sql_top_orders")(
      """SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice, rnk
        |FROM (
        |  SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rnk <= 3
        |ORDER BY c_custkey, rnk""".stripMargin),

    // Corpus datasheet by (lang, source) — the curation surface reached
    // through SQL: a data buyer's first query against the documents
    // table.
    shared("q124_sql_corpus_datasheet")(
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin),

    // SQL over the engine's OWN table-format layer: `silver_orders` is
    // the manifest store's committed state registered as a view — the
    // reference's literal promise (silver Iceberg table, queryable by
    // SQL). The oracle targets the raw `orders` table, which the
    // store's four appends partition exactly, so store-read == raw.
    QueryDef(
      "q126_sql_store",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) {
      (s, dir) =>
        StoreOps.registerSilverView(s, dir)
        SqlEntry.sql(s, dir,
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            |    AS total
            |FROM silver_orders
            |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
            |GROUP BY o_orderstatus, o_orderpriority
            |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    },

    // Time travel through SQL text (round-6 verdict, "What's missing"
    // 3): `silver_orders_v2` is the store AS OF manifest version 2 —
    // the state after the first two year-ranged appends — queried the
    // way a Delta/Iceberg BI user writes `FROM table@v2`. The oracle
    // reproduces the historical state from the raw table with the
    // version's own predicate (same reconstruction q86 pins for the
    // Scala read path; this pins the SQL route).
    QueryDef(
      "q128_sql_timetravel",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) {
      (s, dir) =>
        StoreOps.registerStoreSqlViews(s, dir)
        SqlEntry.sql(s, dir,
          """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            |    AS total
            |FROM silver_orders_v2
            |GROUP BY o_orderstatus, o_orderpriority
            |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    },

    // Change-data-feed through SQL text: `silver_orders_changes` is the
    // rows ADDED between manifest versions 2 and 4 (the 1998-99 and
    // 2000+ batches), the `table_changes(...)` shape a downstream SQL
    // consumer uses to process a day's appends without rescanning the
    // table. Oracle = the same delta reconstructed from the raw table
    // (q103's reconstruction, on the SQL route).
    QueryDef(
      "q129_sql_changes",
      """SELECT o_orderpriority,
        |  CAST(MIN(o_orderdate) AS DATE) AS first_date,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        StoreOps.registerStoreSqlViews(s, dir)
        SqlEntry.sql(s, dir,
          """SELECT o_orderpriority,
            |  CAST(MIN(o_orderdate) AS DATE) AS first_date,
            |  COUNT(*) AS n_orders,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            |    AS total
            |FROM silver_orders_changes
            |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
            .stripMargin)
    },

    // Commit history through SQL text: `silver_orders_history` is the
    // DESCRIBE HISTORY ledger (one row per manifest version, rows
    // counted from manifest metadata alone — zero data files opened).
    // The oracle reconstructs the cumulative ledger from the raw
    // table's batch-defining date ranges, as q120 does for the Scala
    // route.
    QueryDef(
      "q130_sql_history",
      """WITH c AS (SELECT
        |  SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
        |      THEN 1 ELSE 0 END) AS b0,
        |  SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
        |      AND o_orderdate < TIMESTAMP '1998-01-01'
        |      THEN 1 ELSE 0 END) AS b1,
        |  SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |      AND o_orderdate < TIMESTAMP '2000-01-01'
        |      THEN 1 ELSE 0 END) AS b2,
        |  SUM(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01'
        |      THEN 1 ELSE 0 END) AS b3 FROM orders)
        |SELECT version, version AS n_batches,
        |  CAST(CASE version WHEN 1 THEN b0 WHEN 2 THEN b0 + b1
        |    WHEN 3 THEN b0 + b1 + b2 ELSE b0 + b1 + b2 + b3 END
        |    AS BIGINT) AS n_rows
        |FROM c CROSS JOIN (SELECT CAST(UNNEST(range(1, 5)) AS BIGINT)
        |  AS version)
        |ORDER BY version""".stripMargin) { (s, dir) =>
      StoreOps.registerStoreSqlViews(s, dir)
      SqlEntry.sql(s, dir,
        """SELECT version, n_batches, n_rows
          |FROM silver_orders_history
          |ORDER BY version""".stripMargin)
    },

    // Store WRITES through SQL text (round-7 verdict, "What's missing"
    // 3): `silver_dml` is the store after a `DELETE FROM` (drops the
    // 2000+ batch — stats-pruned CoW: untouched dirs carry forward) and
    // an `UPDATE ... SET` (re-prioritizes 1998-99 orders), both parsed
    // by Spark's own parser and routed by [[graft.engine.StoreSql]] to
    // the manifest store's DML. The oracle replays both statements'
    // semantics on the raw table: the delete as a WHERE, the update as
    // a CASE over the priority.
    QueryDef(
      "q198_sql_store_dml",
      """SELECT o_orderstatus,
        |  CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN concat('X-', o_orderpriority) ELSE o_orderpriority END
        |    AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      StoreOps.registerDmlSqlView(s, dir)
      SqlEntry.sql(s, dir,
        """SELECT o_orderstatus, o_orderpriority AS priority,
          |  COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_dml
          |GROUP BY 1, 2
          |ORDER BY 1, 2""".stripMargin)
    },

    // MERGE INTO through SQL text: one `UPDATE SET * / INSERT *` upsert
    // whose source is the 1998+ orders re-priced (+10) — matched keys
    // replaced, unmatched inserted, one commit (the streaming-CDC apply
    // shape). Oracle = pre-1998 rows as-is UNION ALL 1998+ rows
    // re-priced, exactly the post-merge state.
    QueryDef(
      "q199_sql_store_merge",
      """WITH merged AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 10.0 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      StoreOps.registerMergeSqlView(s, dir)
      SqlEntry.sql(s, dir,
        """SELECT o_orderstatus, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_merged GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // Merge-on-read DELETE through SQL text: the store's
    // `morDeleteKey` table property (Iceberg write.delete.mode=
    // merge-on-read) routes the SAME `DELETE FROM` text q198 uses to an
    // equality-delete commit — one small key file, zero data dirs
    // rewritten — and the view reads the anti-joined merge-on-read
    // state pre-compact. current_version pins that exactly one commit
    // (the delete file) followed the four appends. Oracle = the raw
    // table minus the predicate's rows.
    QueryDef(
      "q200_sql_mor_delete",
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  5 AS current_version
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val store = StoreOps.registerMorSqlView(s, dir)
      val v = store.currentVersion(s)
      SqlEntry.sql(s, dir,
        s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS total,
           |  CAST($v AS INTEGER) AS current_version
           |FROM silver_mor GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin)
    },

    // GENERAL MERGE through SQL text (round-8 verdict, "What's missing"
    // 4): the CDC-apply clause surface the star form cannot express —
    // first-match-wins conditional matched clauses, a column-level SET
    // over a source expression, matched DELETE, INSERT * — applied in
    // ONE commit by [[graft.engine.StoreSql]] →
    // `ManifestTableStore.mergeClauses`. Urgent matched orders take the
    // feed price +5 (orig +15), every other matched [1998,2000) order
    // is dropped, 2000+ keys insert at feed price (orig +10). The
    // oracle replays exactly those clause semantics on the raw table.
    QueryDef(
      "q204_sql_merge_clauses",
      """WITH merged AS (
        |  SELECT o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice + 15.0 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |    AND o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice + 10.0 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM merged GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      StoreOps.registerCdcMergeSqlView(s, dir)
      SqlEntry.sql(s, dir,
        """SELECT o_orderpriority, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_cdc GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // WHEN NOT MATCHED BY SOURCE through SQL text — the snapshot-sync
    // form that retires target rows the feed no longer carries:
    // matched keys take the feed price, unmatched pre-1997 rows are
    // deleted (clause-scoped), [1997,1998) and 2000+ rows carry
    // untouched. By-source clauses inspect every target row, so this
    // exercises the all-dirs rewrite scope (the cost Delta documents
    // for whenNotMatchedBySource).
    QueryDef(
      "q205_sql_merge_bysource",
      """WITH merged AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE (o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |    OR o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 10.0 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00')
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      StoreOps.registerSyncMergeSqlView(s, dir)
      SqlEntry.sql(s, dir,
        """SELECT o_orderstatus, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_sync GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // INSERT INTO through SQL text, completing the SQL write surface
    // (SELECT/INSERT/DELETE/UPDATE/MERGE): the 2000+ slice appended by
    // statement — issued TWICE under one batch id, so the oracle (the
    // whole raw table, applied once) hash-checks the exactly-once
    // replay no-op itself: a double-apply would double every 2000+
    // count.
    QueryDef(
      "q206_sql_insert",
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      StoreOps.registerInsertSqlView(s, dir)
      SqlEntry.sql(s, dir,
        """SELECT o_orderstatus, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_ins GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin)
    },

    // TIME TRAVEL AS SQL TEXT (round-9 verdict, "What's missing" 2):
    // `FROM t VERSION AS OF 2` — the first clause a BI user types after
    // learning the table has history, parsed by Spark's OWN grammar
    // (RelationTimeTravel) and routed by [[graft.engine.StoreSql.query]]
    // to the manifest store's version read. q128 pinned the
    // pre-resolved-VIEW route; this pins the CLAUSE itself, plus
    // composition: the same statement anti-joins current state against
    // the historical version to compute the delta — something no
    // pre-resolved view pair can express without N views. Oracle =
    // version 2's own predicate on the raw table (the [1995,1998)
    // appends), delta = the 1998+ slice.
    QueryDef(
      "q209_sql_version_asof",
      """WITH v2 AS (SELECT * FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |delta AS (SELECT * FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |SELECT 'asof' AS slice, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM v2 GROUP BY 1, 2
        |UNION ALL
        |SELECT 'delta' AS slice, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM delta GROUP BY 1, 2
        |ORDER BY slice, o_orderstatus""".stripMargin) { (s, dir) =>
      graft.engine.StoreSql.query(s, StoreOps.timeTravelTables(s, dir),
        """SELECT 'asof' AS slice, o_orderstatus, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_tt VERSION AS OF 2 GROUP BY 1, 2
          |UNION ALL
          |SELECT 'delta' AS slice, o_orderstatus, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM (SELECT cur.* FROM silver_tt cur
          |      LEFT ANTI JOIN silver_tt VERSION AS OF 2 old
          |      ON cur.o_orderkey = old.o_orderkey) d
          |GROUP BY 1, 2
          |ORDER BY slice, o_orderstatus""".stripMargin)
    },

    // INSERT OVERWRITE through SQL text (round-9 verdict, "What's
    // missing" 4): dynamic partition overwrite — the bread-and-butter
    // idempotent batch write ("recompute the 1-URGENT partition") as a
    // replace-matching-dirs manifest commit. The statement ran TWICE
    // under one batch id, so the oracle (non-urgent as-is UNION urgent
    // re-priced once) hash-checks the replay no-op, and the emitted
    // current_version pins that exactly two commits exist (seed +
    // overwrite): a double-applied overwrite would both re-price +200
    // and show a third version.
    QueryDef(
      "q212_sql_insert_overwrite",
      """WITH st AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderpriority <> '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 100.0 FROM orders
        |  WHERE o_orderpriority = '1-URGENT')
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  CAST(2 AS BIGINT) AS current_version
        |FROM st GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val store = StoreOps.registerOverwriteSqlView(s, dir)
      val v = store.currentVersion(s)
      SqlEntry.sql(s, dir,
        s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS total,
           |  CAST($v AS BIGINT) AS current_version
           |FROM silver_ovw GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin)
    },

    // Tag names in the version slot — Iceberg's ref convention
    // (`VERSION AS OF 'audit-pre2000'` reads the tagged snapshot):
    // operationally the clause that makes a NAMED audit state queryable
    // by anyone with SQL access, no API in sight. The tag resolves to
    // v3 (the [1995,2000) appends); a tag that silently moved or
    // mis-resolved hash-mismatches against the oracle's reconstruction.
    QueryDef(
      "q210_sql_tag_asof",
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      graft.engine.StoreSql.query(s, StoreOps.timeTravelTables(s, dir),
        """SELECT o_orderpriority, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM silver_tt VERSION AS OF 'audit-pre2000'
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    })
}
