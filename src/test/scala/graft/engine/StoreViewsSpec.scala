package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Persistent CREATE VIEW / DROP VIEW / SHOW VIEWS through StoreCatalog
  * (reference README.md:42 — BI tools query named views over governed
  * tables): text sidecars, read-time splicing, fresh-session discovery.
  */
class StoreViewsSpec extends SparkSpec {

  import spark.implicits._

  test("a view persists, splices at read time over the LIVE table, " +
      "survives the creating session, round-trips through SHOW CREATE " +
      "TABLE, and composes (view over view, CTAS from a view)") {
    val base = Files.createTempDirectory("views-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark,
      "CREATE TABLE ev (k STRING, n INT) USING graft_store " +
        "TBLPROPERTIES ('statsColumns'='n')")
    cat.exec(spark, "INSERT INTO ev VALUES ('a', 1), ('b', 2), ('a', 3)",
      batchId = Some(0L))
    cat.exec(spark,
      "CREATE VIEW top_k AS SELECT k, sum(n) AS total FROM ev " +
        "GROUP BY k")
    assert(cat.query(spark,
      "SELECT k, total FROM top_k ORDER BY k").as[(String, Long)]
      .collect().toSeq == Seq(("a", 4L), ("b", 2L)))
    // LIVE: new rows show without any view maintenance
    cat.exec(spark, "INSERT INTO ev VALUES ('b', 10)",
      batchId = Some(1L))
    assert(cat.query(spark,
      "SELECT total FROM top_k WHERE k = 'b'").as[Long]
      .collect().toSeq == Seq(12L))
    // a FRESH catalog discovers and queries a view it did not create
    val cat2 = new StoreCatalog(base.toString)
    assert(cat2.exec(spark, "SHOW VIEWS").select("viewName")
      .as[String].collect().toSeq == Seq("top_k"))
    assert(cat2.query(spark,
      "SELECT k, total FROM top_k ORDER BY k").count() == 2)
    // SHOW CREATE TABLE round-trips the definition text
    val ddl = cat2.exec(spark, "SHOW CREATE TABLE top_k")
      .head().getString(0)
    assert(ddl.startsWith("CREATE VIEW top_k AS"))
    // DESCRIBE serves the analyzed view schema; EXTENDED adds the
    // definition; SHOW COLUMNS lists the output columns
    val desc = cat2.exec(spark, "DESCRIBE TABLE top_k")
      .as[(String, String, String)].collect().toSeq
    assert(desc.map(_._1).take(2) == Seq("k", "total"), desc)
    val ext = cat2.exec(spark, "DESCRIBE TABLE EXTENDED top_k")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext.get("Type").contains("VIEW") &&
      ext("View Text").contains("FROM ev"))
    assert(cat2.exec(spark, "SHOW COLUMNS IN top_k").as[String]
      .collect().toSeq.take(2) == Seq("k", "total"))
    cat2.exec(spark, "DROP VIEW top_k")
    cat2.exec(spark, ddl.replace("CREATE VIEW", "CREATE VIEW"))
    assert(cat2.query(spark, "SELECT count(*) AS c FROM top_k")
      .head().getLong(0) == 2L)
    // composition: a view over the view, and CTAS from a view
    cat2.exec(spark,
      "CREATE VIEW big AS SELECT k FROM top_k WHERE total > 3")
    assert(cat2.query(spark, "SELECT k FROM big ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b"))
    cat2.exec(spark,
      "CREATE TABLE big_mat USING graft_store AS SELECT k FROM big",
      batchId = Some(0L))
    assert(cat2.query(spark, "SELECT k FROM big_mat ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b"))
    // DML surfaces splice views too: INSERT ... SELECT FROM <view>
    // and MERGE ... USING <view>
    cat2.exec(spark,
      "CREATE TABLE sink (k STRING, total BIGINT) USING graft_store")
    cat2.exec(spark, "INSERT INTO sink SELECT k, total FROM top_k",
      batchId = Some(0L))
    assert(cat2.query(spark, "SELECT k, total FROM sink ORDER BY k")
      .as[(String, Long)].collect().toSeq ==
      Seq(("a", 4L), ("b", 12L)))
    cat2.exec(spark, "INSERT INTO ev VALUES ('a', 100)",
      batchId = Some(2L))
    cat2.exec(spark,
      """MERGE INTO sink USING top_k ON sink.k = top_k.k
        |WHEN MATCHED THEN UPDATE SET total = top_k.total"""
        .stripMargin, batchId = Some(1L))
    assert(cat2.query(spark, "SELECT total FROM sink WHERE k = 'a'")
      .as[Long].collect().toSeq == Seq(104L))
  }

  test("view lifecycle edges: OR REPLACE swaps the text, IF NOT EXISTS " +
      "no-ops, a broken definition refuses at DDL time, DROP VIEW " +
      "IF EXISTS tolerates absence, and the table/view namespace is " +
      "mutually exclusive with verb-correct refusals") {
    val base = Files.createTempDirectory("views-edge-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE t (n INT) USING graft_store")
    cat.exec(spark, "INSERT INTO t VALUES (1), (2)", batchId = Some(0L))
    cat.exec(spark, "CREATE VIEW v AS SELECT n FROM t WHERE n > 1")
    intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE VIEW v AS SELECT n FROM t")
    }
    cat.exec(spark, "CREATE VIEW IF NOT EXISTS v AS SELECT n FROM t")
    assert(cat.query(spark, "SELECT n FROM v").count() == 1) // old text
    cat.exec(spark, "CREATE OR REPLACE VIEW v AS SELECT n FROM t")
    assert(cat.query(spark, "SELECT n FROM v").count() == 2) // new text
    // broken definitions refuse at create: unknown table, bad SQL
    intercept[Exception] {
      cat.exec(spark, "CREATE VIEW broken AS SELECT x FROM ghost")
    }
    assert(!cat.listViews(spark).contains("broken"))
    // namespace exclusivity, each direction with the right verb hint
    val e1 = intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE TABLE v (x INT) USING graft_store")
    }
    assert(e1.getMessage.contains("VIEW"))
    val e2 = intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE VIEW t AS SELECT n FROM t")
    }
    assert(e2.getMessage.contains("TABLE"))
    val e3 = intercept[IllegalArgumentException] {
      cat.exec(spark, "DROP TABLE v")
    }
    assert(e3.getMessage.contains("DROP VIEW"))
    intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE TABLE v2 SHALLOW CLONE v")
    }
    cat.exec(spark, "DROP VIEW v")
    intercept[IllegalArgumentException] { cat.exec(spark, "DROP VIEW v") }
    cat.exec(spark, "DROP VIEW IF EXISTS v")
    assert(cat.exec(spark, "SHOW VIEWS").count() == 0)
  }

  test("time travel: ON a view refuses (views are unversioned); INSIDE " +
      "a view definition it composes — a view can pin a table version") {
    val base = Files.createTempDirectory("views-tt-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE tt (n INT) USING graft_store")
    cat.exec(spark, "INSERT INTO tt VALUES (1)", batchId = Some(0L)) // v2
    cat.exec(spark, "INSERT INTO tt VALUES (2)", batchId = Some(1L)) // v3
    cat.exec(spark, "CREATE VIEW vt AS SELECT n FROM tt")
    val e = intercept[IllegalArgumentException] {
      cat.query(spark, "SELECT n FROM vt VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("unversioned") ||
      e.getMessage.contains("definition"))
    cat.exec(spark,
      "CREATE VIEW vt_pinned AS SELECT n FROM tt VERSION AS OF 2")
    assert(cat.query(spark, "SELECT n FROM vt_pinned").as[Int]
      .collect().toSeq == Seq(1))
    assert(cat.query(spark, "SELECT n FROM vt ORDER BY n").as[Int]
      .collect().toSeq == Seq(1, 2))
  }

  test("a REPLACE-created view cycle refuses at QUERY time via the " +
      "depth cap (creation cannot see it: validation runs against the " +
      "still-published old text)") {
    val base = Files.createTempDirectory("views-cycle-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE c (n INT) USING graft_store")
    cat.exec(spark, "INSERT INTO c VALUES (1)", batchId = Some(0L))
    cat.exec(spark, "CREATE VIEW v2 AS SELECT n FROM c")
    cat.exec(spark, "CREATE VIEW v1 AS SELECT n FROM v2")
    cat.exec(spark, "CREATE OR REPLACE VIEW v2 AS SELECT n FROM v1")
    val e = intercept[IllegalArgumentException] {
      cat.query(spark, "SELECT n FROM v2").collect()
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("a view reference in a SUBQUERY expression splices too, and the " +
      "spliced view inherits the table's manifest pruning (the " +
      "statement's WHERE reaches the store scan through the view)") {
    val base = Files.createTempDirectory("views-subq-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE s (k STRING, n INT) USING " +
      "graft_store TBLPROPERTIES ('statsColumns'='n')")
    cat.exec(spark, "INSERT INTO s VALUES ('a', 1), ('b', 100)",
      batchId = Some(0L))
    cat.exec(spark, "INSERT INTO s VALUES ('c', 200), ('d', 300)",
      batchId = Some(1L))
    cat.exec(spark, "CREATE VIEW sv AS SELECT k, n FROM s")
    // subquery-expression reference
    assert(cat.query(spark,
      "SELECT k FROM s WHERE n > (SELECT avg(n) FROM sv)")
      .as[String].collect().toSet == Set("c", "d"))
    // pruning: the WHERE pushes through the view into the format scan
    // — the physical plan must carry the pushed filter on the
    // graft-store relation (the same splice q122-style SQL reads get)
    val plan = cat.query(spark,
      "SELECT k FROM sv WHERE n >= 200").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(n,200)"), plan)
  }
}
