package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.engine.Tables
import graft.engine.Pin.Pinnable

/** Declarative data profiling + constraint verification — the Deequ /
  * Great-Expectations surface a production lakehouse runs before every
  * publish (the reference's bronze→silver promotion implies exactly this
  * gate; q136's write-audit-publish hard-codes ONE predicate — this is
  * the generalized, declarative form a data platform exposes).
  *
  * Both operators are single-pass by construction: every requested
  * metric compiles into ONE `agg` over ONE scan (Catalyst fuses the
  * conditional counts into the same WholeStageCodegen span), and the
  * only shuffle is the exact-distinct computation where a spec asks for
  * uniqueness/cardinality. At 100 TB the distinct counts swap for
  * `approx_count_distinct` (the q26 HLL precedent) without changing the
  * operator shape; everything else is a map-side fold to one row.
  * Output is the long-form (col_name/constraint, metric, value) frame
  * monitoring systems ingest directly.
  *
  * Determinism: fractions and means are rounded to 6 decimals; means
  * accumulate in DECIMAL(38,6) (float sums across shuffle partitions are
  * order-nondeterministic in double; decimal addition is exact and
  * commutative) and divide once at the boundary.
  */
object ProfileOps {

  /** What to profile for one column. `numeric`/`textLen` add min/max/
    * mean (resp. length-based) rows; `distinct` adds exact cardinality.
    */
  final case class ColumnSpec(
      name: String,
      distinct: Boolean = false,
      numeric: Boolean = false,
      textLen: Boolean = false)

  /** One declarative constraint: `metric` is any aggregate expression
    * over the frame (a fraction, a count, a cardinality ratio) — the
    * observed value the report carries; `passed` is an independent
    * aggregate BOOLEAN so the verdict compares exact counts, never the
    * display-rounded metric (a 0.9999996 compliance must fail a
    * strict-equality check even though it prints as 1.0). Mirrors
    * Deequ's `Check.hasX(...)` calls compiled to one
    * VerificationSuite pass.
    */
  final case class Check(
      name: String,
      metric: Column,
      passed: Column)

  /** Column-level dataset profile: one row per (column, metric), all
    * metrics from ONE aggregate over ONE scan.
    */
  def profile(df: DataFrame, cols: Seq[ColumnSpec]): DataFrame = {
    val n = count(lit(1))
    def frac(c: Column) = round(c.cast("double") / n, 6)
    // (col_name, metric, value-expression) triples; all values double.
    val entries: Seq[(String, String, Column)] =
      ("_table", "n_rows", n.cast("double")) +: cols.flatMap { cs =>
        val c = col(cs.name)
        val base = Seq((cs.name, "completeness", frac(count(c))))
        val dist =
          if (cs.distinct)
            Seq((cs.name, "n_distinct", count_distinct(c).cast("double")))
          else Nil
        val num =
          if (cs.numeric) Seq(
            (cs.name, "min", min(c).cast("double")),
            (cs.name, "max", max(c).cast("double")),
            (cs.name, "mean", round(
              sum(c.cast(DecimalType(38, 6))).cast("double") / count(c),
              6)))
          else Nil
        val len =
          if (cs.textLen) Seq(
            (cs.name, "min_len", min(length(c)).cast("double")),
            (cs.name, "max_len", max(length(c)).cast("double")),
            (cs.name, "avg_len", round(
              sum(length(c).cast(DecimalType(38, 6))).cast("double") /
                count(c), 6)))
          else Nil
        base ++ dist ++ num ++ len
      }
    val row = df.agg(entries.head._3.as("m0"),
      entries.tail.zipWithIndex.map { case (e, i) =>
        e._3.as(s"m${i + 1}")
      }: _*)
    row.select(explode(array(entries.zipWithIndex.map { case (e, i) =>
      struct(lit(e._1).as("col_name"), lit(e._2).as("metric"),
        col(s"m$i").as("value"))
    }: _*)).as("e"))
      .select("e.*")
      .orderBy("col_name", "metric")
  }

  /** Constraint verification: every check's metric computed in ONE
    * aggregate pass, each row carrying the observed value and the
    * verdict — the publish gate reads `min(passed)`.
    */
  def verify(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggCols = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.metric.as(s"m$i"), c.passed.as(s"p$i"))
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    row.select(explode(array(checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"m$i").cast("double").as("value"),
        col(s"p$i").as("passed"))
    }: _*)).as("e"))
      .select("e.*")
      .orderBy("check_name")
  }

  def defs: Seq[QueryDef] = Seq(

    // Dataset profile of the documents corpus — the datasheet-style
    // column summary (completeness, cardinality, numeric/length ranges)
    // a curator reads before any pipeline touches the data.
    QueryDef(
      "q156_profile",
      """WITH a AS (SELECT COUNT(*) AS n,
        |    COUNT(doc_id) AS c_doc, COUNT(DISTINCT doc_id) AS d_doc,
        |    COUNT(text) AS c_text,
        |    MIN(length(text)) AS mn_len, MAX(length(text)) AS mx_len,
        |    round(CAST(SUM(CAST(length(text) AS DECIMAL(38,6)))
        |      AS DOUBLE) / COUNT(text), 6) AS av_len,
        |    COUNT(lang) AS c_lang, COUNT(DISTINCT lang) AS d_lang,
        |    COUNT(source) AS c_src, COUNT(DISTINCT source) AS d_src,
        |    COUNT(n_chars) AS c_nch,
        |    MIN(n_chars) AS mn_nch, MAX(n_chars) AS mx_nch,
        |    round(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE)
        |      / COUNT(n_chars), 6) AS av_nch
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT '_table' AS col_name, 'n_rows' AS metric,
        |    CAST(n AS DOUBLE) AS value FROM a
        |  UNION ALL SELECT 'doc_id', 'completeness',
        |    round(c_doc / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'doc_id', 'n_distinct',
        |    CAST(d_doc AS DOUBLE) FROM a
        |  UNION ALL SELECT 'text', 'completeness',
        |    round(c_text / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'text', 'min_len',
        |    CAST(mn_len AS DOUBLE) FROM a
        |  UNION ALL SELECT 'text', 'max_len',
        |    CAST(mx_len AS DOUBLE) FROM a
        |  UNION ALL SELECT 'text', 'avg_len', av_len FROM a
        |  UNION ALL SELECT 'lang', 'completeness',
        |    round(c_lang / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'lang', 'n_distinct',
        |    CAST(d_lang AS DOUBLE) FROM a
        |  UNION ALL SELECT 'source', 'completeness',
        |    round(c_src / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'source', 'n_distinct',
        |    CAST(d_src AS DOUBLE) FROM a
        |  UNION ALL SELECT 'n_chars', 'completeness',
        |    round(c_nch / CAST(n AS DOUBLE), 6) FROM a
        |  UNION ALL SELECT 'n_chars', 'min',
        |    CAST(mn_nch AS DOUBLE) FROM a
        |  UNION ALL SELECT 'n_chars', 'max',
        |    CAST(mx_nch AS DOUBLE) FROM a
        |  UNION ALL SELECT 'n_chars', 'mean', av_nch FROM a
        |) t ORDER BY col_name, metric""".stripMargin) { (s, dir) =>
      profile(Tables(s, dir, "documents"), Seq(
        ColumnSpec("doc_id", distinct = true),
        ColumnSpec("text", textLen = true),
        ColumnSpec("lang", distinct = true),
        ColumnSpec("source", distinct = true),
        ColumnSpec("n_chars", numeric = true)))
    },

    // Constraint verification over the orders table — the declarative
    // publish gate: completeness, key uniqueness, domain membership,
    // non-negativity, date sanity, each with its observed compliance
    // value and verdict. All metrics from one pass; DuckDB recomputes
    // the same fractions, so a silently-drifted gate hash-mismatches.
    QueryDef(
      "q157_constraints",
      """WITH a AS (SELECT COUNT(*) AS n,
        |    COUNT(o_orderkey) AS c_key,
        |    COUNT(DISTINCT o_orderkey) AS d_key,
        |    SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS nn,
        |    SUM(CASE WHEN o_orderstatus IN ('O','F','P')
        |        THEN 1 ELSE 0 END) AS dom,
        |    SUM(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01'
        |        AND o_orderdate < TIMESTAMP '2002-01-01'
        |        THEN 1 ELSE 0 END) AS dr
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'orderdate_in_range' AS check_name,
        |    round(dr / CAST(n AS DOUBLE), 6) AS value,
        |    dr = n AS passed FROM a
        |  UNION ALL SELECT 'orderkey_complete',
        |    round(c_key / CAST(n AS DOUBLE), 6), c_key = n FROM a
        |  UNION ALL SELECT 'orderkey_unique',
        |    round(d_key / CAST(n AS DOUBLE), 6), d_key = n FROM a
        |  UNION ALL SELECT 'rows_nonempty',
        |    CAST(n AS DOUBLE), n > 0 FROM a
        |  UNION ALL SELECT 'status_in_domain',
        |    round(dom / CAST(n AS DOUBLE), 6), dom = n FROM a
        |  UNION ALL SELECT 'totalprice_nonnegative',
        |    round(nn / CAST(n AS DOUBLE), 6), nn = n FROM a
        |) t ORDER BY check_name""".stripMargin) { (s, dir) =>
      val n = count(lit(1))
      def fracOf(c: Column) = round(c.cast("double") / n, 6)
      val nonneg = sum(when(col("o_totalprice") >= 0, 1L).otherwise(0L))
      val dom = sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L))
      val dr = sum(when(col("o_orderdate") >=
        lit("1992-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2002-01-01").cast("timestamp"), 1L)
        .otherwise(0L))
      verify(Tables(s, dir, "orders"), Seq(
        Check("rows_nonempty", n.cast("double"), n > 0),
        Check("orderkey_complete", fracOf(count(col("o_orderkey"))),
          count(col("o_orderkey")) === n),
        Check("orderkey_unique",
          fracOf(count_distinct(col("o_orderkey"))),
          count_distinct(col("o_orderkey")) === n),
        Check("totalprice_nonnegative", fracOf(nonneg), nonneg === n),
        Check("status_in_domain", fracOf(dom), dom === n),
        Check("orderdate_in_range", fracOf(dr), dr === n)))
    },

    // Join-key SKEW report — the diagnostic behind every salting /
    // AQE-skew-join decision at 100 TB: for each candidate shuffle key,
    // the per-key count distribution's shape (rows, distinct keys, max,
    // exact p50/p99 of counts, and the heaviest key's share of all
    // rows). A key whose max/p50 explodes or whose top share is
    // measurable is the one that stalls a 1000-executor shuffle on one
    // straggler partition. One count-aggregate per audited key (the
    // per-key frame is the shuffle the join itself would do — measured
    // here once, at plan-choice time, instead of discovered in
    // production); the stats run over the key-count frame, which is
    // distinct-keys-sized.
    QueryDef(
      "q167_skew_report", {
        def one(table: String, key: String): String =
          s"""SELECT '$table.$key' AS join_key,
             |  CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(c) AS BIGINT) AS max_per_key,
             |  round(quantile_cont(c, 0.5) * 1000000) / 1000000.0
             |    AS p50_per_key,
             |  round(quantile_cont(c, 0.99) * 1000000) / 1000000.0
             |    AS p99_per_key,
             |  floor(max(c) / CAST(sum(c) AS DOUBLE) * 1000000)
             |    / 1000000.0 AS top_key_share
             |FROM (SELECT $key, count(*) AS c FROM $table
             |  WHERE $key IS NOT NULL GROUP BY $key) t""".stripMargin
        Seq(one("events", "user_id"), one("lineitem", "l_orderkey"),
          one("lineitem", "l_partkey"), one("orders", "o_custkey"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) u ORDER BY join_key")
      }) { (s, dir) =>
      def one(table: String, key: String): DataFrame =
        Tables(s, dir, table)
          .filter(col(key).isNotNull)
          .groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(sum("c").as("n_rows"),
            count(lit(1)).as("n_keys"),
            max("c").as("max_per_key"),
            (round(expr("percentile(c, 0.5)") * 1000000) / 1000000.0)
              .as("p50_per_key"),
            (round(expr("percentile(c, 0.99)") * 1000000) / 1000000.0)
              .as("p99_per_key"),
            (floor(max("c") / sum("c").cast("double") * 1000000)
              / 1000000.0).as("top_key_share"))
          .select(lit(s"$table.$key").as("join_key"), col("*"))
      one("events", "user_id")
        .unionByName(one("lineitem", "l_orderkey"))
        .unionByName(one("lineitem", "l_partkey"))
        .unionByName(one("orders", "o_custkey"))
        .orderBy("join_key")
    },

    // Cross-modal feature-correlation audit: per source, the EXACT
    // Pearson correlation between document length (n_chars) and
    // embedding L2 norm — the sanity check that catches degenerate
    // embedding runs (truncation artifacts make r spike toward 1;
    // collapsed/constant embeddings drive the norm variance to 0). The
    // trick that makes it hash-checkable: Pearson r is scale-invariant,
    // so the norm floor-scales to a ×1e6 INTEGER and every moment
    // (Σx, Σy, Σx², Σy², Σxy) accumulates exactly in integers/decimals
    // — the only float ops are the final textbook formula, identical
    // IEEE steps in both engines, floor-scaled at the boundary. One
    // joined scan, one per-source aggregate; no corpus-sized shuffle
    // beyond the (doc ⋈ vec) co-key join.
    QueryDef(
      "q172_modal_correlation",
      """WITH y AS (SELECT vec_id,
        |    CAST(floor(sqrt(list_sum(list_transform(
        |      embedding::DOUBLE[], x -> x * x))) * 1000000.0) AS BIGINT)
        |      AS y6
        |  FROM embeddings),
        |j AS (SELECT d.source, CAST(d.n_chars AS BIGINT) AS x, y.y6
        |  FROM documents d JOIN y ON y.vec_id = d.doc_id),
        |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y6) AS BIGINT) AS sy,
        |    sum(x * x) AS sxx, sum(y6 * y6) AS syy, sum(x * y6) AS sxy
        |  FROM j GROUP BY source)
        |SELECT source, n,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0 THEN 0.0
        |    ELSE floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |      * 1000000) / 1000000.0 END AS r_len_norm
        |FROM m ORDER BY source""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val y = Tables(s, dir, "embeddings").select(col("vec_id"),
        floor(expr("sqrt(vec_dot(embedding, embedding))") * 1000000.0)
          .as("y6"))
      val j = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("x"))
        .join(y, col("vec_id") === col("doc_id"))
      val m = j.groupBy("source").agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y6").as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("y6") * col("y6")).cast(DecimalType(38, 0))).as("syy"),
        sum((col("x") * col("y6")).cast(DecimalType(38, 0))).as("sxy"))
      def d(c: Column) = c.cast("double")
      val vx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
      val vy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
      val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
      m.select(col("source"), col("n"),
          when(vx * vy === 0, lit(0.0))
            .otherwise(floor(num / (sqrt(vx) * sqrt(vy)) * 1000000)
              / 1000000.0).as("r_len_norm"))
        .orderBy("source")
    },

    // Referential-integrity audit across the warehouse's FK edges —
    // the constraint class q157's single-table checks can't see. Each
    // edge is ONE left-anti join (child's distinct keys vs parent's
    // key set — at 100 TB the anti-join over distinct keys is the only
    // shape that doesn't rebuild the join), reporting distinct child
    // keys, orphaned keys, orphaned child ROWS, and the verdict.
    QueryDef(
      "q178_referential_integrity", {
        def one(edge: String, child: String, ck: String, parent: String,
            pk: String): String =
          s"""SELECT '$edge' AS fk_edge,
             |  (SELECT CAST(count(DISTINCT $ck) AS BIGINT)
             |   FROM $child WHERE $ck IS NOT NULL) AS n_child_keys,
             |  (SELECT CAST(count(*) AS BIGINT) FROM (
             |     SELECT DISTINCT $ck FROM $child
             |     WHERE $ck IS NOT NULL) c
             |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
             |     WHERE p.$pk = c.$ck)) AS n_orphan_keys,
             |  (SELECT CAST(count(*) AS BIGINT) FROM $child c
             |   WHERE $ck IS NOT NULL AND NOT EXISTS (
             |     SELECT 1 FROM $parent p WHERE p.$pk = c.$ck))
             |    AS n_orphan_rows,
             |  (SELECT count(*) FROM $child c
             |   WHERE $ck IS NOT NULL AND NOT EXISTS (
             |     SELECT 1 FROM $parent p WHERE p.$pk = c.$ck)) = 0
             |    AS intact""".stripMargin
        Seq(
          one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          one("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          one("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          one("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) u ORDER BY fk_edge")
      }) { (s, dir) =>
      def one(edge: String, child: String, ck: String, parent: String,
          pk: String): DataFrame = {
        val c = Tables(s, dir, child).filter(col(ck).isNotNull)
          .select(col(ck))
        val p = Tables(s, dir, parent).select(col(pk))
        val orphanRows = c.join(p, c(ck) === p(pk), "left_anti")
        val orphanKeys = orphanRows.distinct()
        val keys = c.distinct()
        keys.agg(count(lit(1)).as("n_child_keys"))
          .crossJoin(orphanKeys.agg(count(lit(1)).as("n_orphan_keys")))
          .crossJoin(orphanRows.agg(count(lit(1)).as("n_orphan_rows")))
          .select(lit(edge).as("fk_edge"), col("n_child_keys"),
            col("n_orphan_keys"), col("n_orphan_rows"),
            (col("n_orphan_rows") === 0).as("intact"))
      }
      one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey")
        .unionByName(one("lineitem.l_partkey->part", "lineitem",
          "l_partkey", "part", "p_partkey"))
        .unionByName(one("orders.o_custkey->customer", "orders",
          "o_custkey", "customer", "c_custkey"))
        .unionByName(one("customer.c_nationkey->nation", "customer",
          "c_nationkey", "nation", "n_nationkey"))
        .orderBy("fk_edge")
    },

    // Functional-dependency CHECK (the Deequ/Metanome profiling
    // question "does A determine B?"): per candidate pair, the number
    // of A-groups, the groups carrying more than one distinct B (the
    // violations), and the verdict. One (A → distinct-B-count)
    // aggregate per pair — map-side combined, never a self-join.
    // Candidates mix true FDs (order determines its customer and date
    // through the join) with false ones (an order has many parts).
    QueryDef(
      "q179_fd_check", {
        def one(fd: String, rel: String, a: String, b: String): String =
          s"""SELECT '$fd' AS fd, CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_violations,
             |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
             |FROM (SELECT $a, count(DISTINCT $b) AS nb FROM $rel
             |  GROUP BY $a) g""".stripMargin
        val joined = "(SELECT l_orderkey, l_partkey, l_suppkey, " +
          "o_custkey, o_orderdate FROM lineitem " +
          "JOIN orders ON o_orderkey = l_orderkey)"
        Seq(
          one("l_orderkey->o_custkey", joined, "l_orderkey", "o_custkey"),
          one("l_orderkey->o_orderdate", joined, "l_orderkey",
            "o_orderdate"),
          one("l_orderkey->l_partkey", joined, "l_orderkey", "l_partkey"),
          one("l_partkey->l_suppkey", joined, "l_partkey", "l_suppkey"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) u ORDER BY fd")
      }) { (s, dir) =>
      val joined = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .select("l_orderkey", "l_partkey", "l_suppkey", "o_custkey",
          "o_orderdate")
      def one(fd: String, a: String, b: String): DataFrame =
        joined.groupBy(col(a))
          .agg(count_distinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nb") > 1, 1L).otherwise(0L))
              .as("n_violations"))
          .select(lit(fd).as("fd"), col("n_groups"),
            col("n_violations"), (col("n_violations") === 0).as("holds"))
      one("l_orderkey->o_custkey", "l_orderkey", "o_custkey")
        .unionByName(one("l_orderkey->o_orderdate", "l_orderkey",
          "o_orderdate"))
        .unionByName(one("l_orderkey->l_partkey", "l_orderkey",
          "l_partkey"))
        .unionByName(one("l_partkey->l_suppkey", "l_partkey",
          "l_suppkey"))
        .orderBy("fd")
    },

    // Corpus FINGERPRINT receipt — the data-card integrity line: one
    // row per source plus the whole-corpus roll-up, each carrying doc
    // and char counts and an ORDER-FREE exact content fingerprint (the
    // decimal SUM of a 12-hex-digit window of each doc's
    // sha256(doc_id|text) — commutative and associative, so the value
    // is identical on any cluster size, any partitioning, any
    // insertion order; the CcStarSpec fixpoint-hash discipline promoted
    // to the query surface). Two exports whose receipts match are
    // byte-equivalent corpora without any sorting or pairwise compare;
    // a single flipped character moves the sum.
    QueryDef(
      "q192_corpus_fingerprint", {
        val hexWin = (0 until 12).map { i =>
          val p = math.pow(16, 11 - i).toLong
          s"CAST($p AS BIGINT) * (ascii(substr(h, ${i + 1}, 1)) - " +
            s"(CASE WHEN ascii(substr(h, ${i + 1}, 1)) >= 97 " +
            "THEN 87 ELSE 48 END))"
        }.mkString("(", " + ", ")")
        s"""WITH h AS (SELECT source, n_chars,
           |    sha256(CAST(doc_id AS VARCHAR) || '|' || text) AS h
           |  FROM documents),
           |v AS (SELECT source, n_chars, $hexWin AS hv FROM h),
           |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |    CAST(sum(CAST(hv AS DECIMAL(38,0))) AS VARCHAR)
           |      AS fingerprint
           |  FROM v GROUP BY source),
           |tot AS (SELECT '<all>' AS source,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |    CAST(sum(CAST(hv AS DECIMAL(38,0))) AS VARCHAR)
           |      AS fingerprint
           |  FROM v)
           |SELECT * FROM (SELECT * FROM per UNION ALL
           |  SELECT * FROM tot) u
           |ORDER BY source""".stripMargin
      }) { (s, dir) =>
      val v = Tables(s, dir, "documents")
        .select(col("source"), col("n_chars"),
          expr("cast(conv(substr(sha2(concat(cast(doc_id as string), " +
            "'|', text), 256), 1, 12), 16, 10) as decimal(38,0))")
            .as("hv"))
      val per = v.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("n_chars"),
          sum("hv").cast(DecimalType(38, 0)).cast("string")
            .as("fingerprint"))
      val tot = v.agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("n_chars"),
          sum("hv").cast(DecimalType(38, 0)).cast("string")
            .as("fingerprint"))
        .select(lit("<all>").as("source"), col("*"))
      per.unionByName(tot).orderBy("source")
    },

    // Length × quality 2-D HISTOGRAM — the dependence heatmap a flat
    // profile can't show: docs bucketed by exact n_chars quintile AND
    // q30-quality quintile, with counts per cell. A diagonal ridge
    // means quality is just length in disguise (re-weight before
    // filtering on it); a flat sheet means independent signals. Edges
    // are exact quintiles computed ENTIRELY IN INTEGER SPACE (the q154
    // discipline: ranked values, edge = a·10 + (b−a)·rem in ×10 units
    // with rem = (n−1)·2k mod 10; the quality score pre-rounds to
    // micro-ints) — engine quantile builtins interpolate in floating
    // point and drift in the last ulp at scale, snapping boundary rows
    // across bins. Bucketing is a row-local integer compare against
    // the broadcast edge row; counts are exact integers. Scale shape:
    // the two exact ranks run as DISTRIBUTED range-partitioned sorts
    // ([[ExactRank]] — corpus/n rows per task, a bounded per-partition-
    // counts collect, no single-partition window); at 100 TB swap them
    // for approx_percentile and everything downstream is unchanged.
    QueryDef(
      "q193_length_quality_hist", {
        val qExpr = "least(1.0, len(string_split(text,' ')) / 100.0) " +
          "* (1.0 - CAST(len(list_filter(string_split(text,' '), " +
          "w -> w IN ('the','a'))) AS DOUBLE) " +
          "/ len(string_split(text,' ')))"
        def pivot(src: String, pfx: String): String =
          (1 to 4).map(k =>
            s"MAX(CASE k WHEN $k THEN e10 END) AS $pfx$k")
            .mkString(s"SELECT ", ", ", s" FROM $src")
        s"""WITH d AS (SELECT CAST(n_chars AS BIGINT) AS lv,
           |    CAST(round(($qExpr) * 1000000) AS BIGINT) AS qm
           |  FROM documents),
           |rl AS (SELECT lv AS v, ROW_NUMBER() OVER (ORDER BY lv)
           |    AS pos FROM d),
           |rq AS (SELECT qm AS v, ROW_NUMBER() OVER (ORDER BY qm)
           |    AS pos FROM d),
           |ke AS (SELECT CAST(k AS INTEGER) AS k,
           |    (n - 1) * 2 * k // 10 + 1 AS lo,
           |    (n - 1) * 2 * k % 10 AS rem
           |  FROM (SELECT COUNT(*) AS n FROM d) nn,
           |    (SELECT unnest(range(1, 5)) AS k) t),
           |el AS (SELECT ke.k,
           |    a.v * 10 + (COALESCE(b.v, a.v) - a.v) * ke.rem AS e10
           |  FROM ke JOIN rl a ON a.pos = ke.lo
           |  LEFT JOIN rl b ON b.pos = ke.lo + 1),
           |eq AS (SELECT ke.k,
           |    a.v * 10 + (COALESCE(b.v, a.v) - a.v) * ke.rem AS e10
           |  FROM ke JOIN rq a ON a.pos = ke.lo
           |  LEFT JOIN rq b ON b.pos = ke.lo + 1),
           |epl AS (${pivot("el", "l")}),
           |epq AS (${pivot("eq", "m")}),
           |b AS (SELECT
           |    1 + CAST(lv * 10 > l1 AS INTEGER)
           |      + CAST(lv * 10 > l2 AS INTEGER)
           |      + CAST(lv * 10 > l3 AS INTEGER)
           |      + CAST(lv * 10 > l4 AS INTEGER) AS len_bin,
           |    1 + CAST(qm * 10 > m1 AS INTEGER)
           |      + CAST(qm * 10 > m2 AS INTEGER)
           |      + CAST(qm * 10 > m3 AS INTEGER)
           |      + CAST(qm * 10 > m4 AS INTEGER) AS q_bin
           |  FROM d, epl, epq)
           |SELECT len_bin, q_bin, CAST(count(*) AS BIGINT) AS n
           |FROM b GROUP BY len_bin, q_bin
           |ORDER BY len_bin, q_bin""".stripMargin
      }) { (s, dir) =>
      val words = "split(text, ' ')"
      val d = Tables(s, dir, "documents").select(
        col("n_chars").cast("long").as("lv"),
        expr(s"cast(round(least(1.0, size($words) / 100.0) * (1.0 - " +
          s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
          s" / size($words)) * 1000000) as bigint)").as("qm"))
        .pinned
      // exact quintile edges WITHOUT the single-partition window funnel
      // AND without projecting a rank onto every row: the distributed
      // rank-select ([[ExactRank.valuesAt]]) reads just the 8 edge
      // positions per column off the range-partitioned sort — one
      // pinpoint filter instead of the former broadcast-join rank
      // projection + ke/edge join chain. The e10 interpolation is exact
      // integer arithmetic on the collected longs (identical to the
      // oracle's a·10 + (b−a)·rem), and the bin thresholds enter the
      // final corpus pass as literals — zero joins. (v, pos) pairs
      // match the window's (ties share v): the oracle hash is
      // unchanged.
      def edgeLits(c: String): IndexedSeq[Long] = {
        val (n, vals) = graft.engine.ExactRank.valuesAt(
          d.select(col(c)), c,
          n => (1 to 4).flatMap { k =>
            val lo = (n - 1) * 2 * k / 10 + 1; Seq(lo, lo + 1)
          })
        (1 to 4).map { k =>
          val lo = (n - 1) * 2 * k / 10 + 1
          val rem = (n - 1) * 2 * k % 10
          // empty corpus: no positions collected — any literal serves,
          // the final aggregate over the empty frame is empty either
          // way (the former LEFT-JOIN edges also yielded empty)
          val a = vals.getOrElse(lo, 0L)
          val b = vals.getOrElse(lo + 1, a)
          a * 10 + (b - a) * rem
        }
      }
      val le = edgeLits("lv")
      val me = edgeLits("qm")
      val lenBin = (1 to 4).map(k =>
        (col("lv") * 10 > lit(le(k - 1))).cast("int")).reduce(_ + _) + 1
      val qBin = (1 to 4).map(k =>
        (col("qm") * 10 > lit(me(k - 1))).cast("int")).reduce(_ + _) + 1
      d.select(lenBin.as("len_bin"), qBin.as("q_bin"))
        .groupBy("len_bin", "q_bin").agg(count(lit(1)).as("n"))
        .orderBy("len_bin", "q_bin")
    })
}
