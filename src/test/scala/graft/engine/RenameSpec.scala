package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** `ALTER TABLE old RENAME TO new` / `ALTER VIEW old RENAME TO new` /
  * `ALTER VIEW v AS <query>` — the lifecycle verbs between CREATE and
  * DROP. Table rename is POINTER-LEVEL (data stays in the directory
  * named after the OLD name; a tombstone keeps the old name from
  * silently re-attaching), views re-publish their text sidecar.
  */
class RenameSpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(): (StoreCatalog, String) = {
    val p = Files.createTempDirectory("rename-")
    p.toFile.deleteOnExit()
    (new StoreCatalog(p.toString), p.toString)
  }

  test("table rename: new name serves the data, a FRESH catalog " +
      "discovers it, the old name refuses with the forwarding hint " +
      "everywhere (SELECT, DROP), SHOW TABLES lists only the new " +
      "name, and writes keep flowing post-rename") {
    val (cat, base) = freshCat()
    cat.exec(spark,
      "CREATE TABLE rn1 (k BIGINT, v STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO rn1 VALUES (1, 'a'), (2, 'b')",
      batchId = Some(0L))
    cat.exec(spark, "ALTER TABLE rn1 RENAME TO rn2")
    assert(cat.query(spark, "SELECT COUNT(*) AS c FROM rn2")
      .head().getLong(0) == 2L)
    // the old name refuses with the hint — never re-attaches the dir
    val e = intercept[IllegalArgumentException] {
      cat.query(spark, "SELECT * FROM rn1")
    }
    assert(e.getMessage.contains("renamed to 'rn2'"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      cat.exec(spark, "DROP TABLE rn1")
    }
    assert(e2.getMessage.contains("rn2"), e2.getMessage)
    // discovery: SHOW TABLES has rn2, not rn1; fresh catalog attaches
    val names = cat.exec(spark, "SHOW TABLES")
      .select("tableName").as[String].collect().toSet
    assert(names.contains("rn2") && !names.contains("rn1"), names)
    val cat2 = new StoreCatalog(base)
    assert(cat2.query(spark, "SELECT COUNT(*) AS c FROM rn2")
      .head().getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      cat2.query(spark, "SELECT * FROM rn1")
    }
    // writes keep flowing under the new name (same manifest chain)
    cat2.exec(spark, "INSERT INTO rn2 VALUES (3, 'c')",
      batchId = Some(1L))
    assert(cat2.query(spark, "SELECT COUNT(*) AS c FROM rn2")
      .head().getLong(0) == 3L)
    // history survives the rename — the chain never moved
    assert(cat2.store("rn2").currentVersion(spark) == 3L)
  }

  test("rename migrates the column-metadata registry: identity keeps " +
      "allocating above the watermark under the new name (the ledger " +
      "lives UNDER the path and is rename-invariant)") {
    val (cat, base) = freshCat()
    cat.exec(spark,
      """CREATE TABLE rid (id BIGINT GENERATED ALWAYS AS IDENTITY
        |  (START WITH 100 INCREMENT BY 10), v STRING)
        |USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO rid (v) VALUES ('a')",
      batchId = Some(0L))
    cat.exec(spark, "ALTER TABLE rid RENAME TO rid2")
    cat.exec(spark, "INSERT INTO rid2 (v) VALUES ('b')",
      batchId = Some(1L))
    val ids = cat.query(spark, "SELECT id FROM rid2 ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids == Seq(100L, 110L), ids)
    // ALWAYS still refuses explicit ids under the new name
    intercept[IllegalArgumentException] {
      cat.exec(spark, "INSERT INTO rid2 (id, v) VALUES (7, 'x')",
        batchId = Some(2L))
    }
    // and a fresh catalog re-attaches the identity spec via the new
    // name's pointer
    val cat2 = new StoreCatalog(base)
    cat2.exec(spark, "INSERT INTO rid2 (v) VALUES ('c')",
      batchId = Some(3L))
    val ids2 = cat2.query(spark, "SELECT id FROM rid2").as[Long]
      .collect().toSeq
    assert(ids2.size == 3 && ids2.distinct.size == 3 &&
      ids2.max == 120L, ids2)
  }

  test("rename preserves the clone-vacuum guard: clone refs travel by " +
      "PATH, so the renamed source still refuses to vacuum history an " +
      "un-severed clone serves") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      "CREATE TABLE vsrc (k BIGINT, v STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO vsrc VALUES (1, 'a')",
      batchId = Some(0L))
    cat.exec(spark, "CREATE TABLE vcl SHALLOW CLONE vsrc")
    // diverge the source so vacuum has something to reclaim
    cat.exec(spark, "INSERT INTO vsrc VALUES (2, 'b')",
      batchId = Some(1L))
    cat.store("vsrc").compact(spark)
    cat.exec(spark, "ALTER TABLE vsrc RENAME TO vsrc2")
    val e = intercept[IllegalStateException] {
      cat.store("vsrc2").vacuum(spark, retainLast = 0, minAgeMs = 0L)
    }
    assert(e.getMessage.toLowerCase.contains("clone"), e.getMessage)
    // the clone still reads (its manifest carries absolute dirs)
    assert(cat.query(spark, "SELECT COUNT(*) AS c FROM vcl")
      .head().getLong(0) == 1L)
  }

  test("rename refusals: target name held by a table or view, view " +
      "definitions referencing the old name, unknown source, " +
      "reserved names") {
    val (cat, _) = freshCat()
    cat.exec(spark, "CREATE TABLE ra (k BIGINT) USING graft_store")
    cat.exec(spark, "CREATE TABLE rb (k BIGINT) USING graft_store")
    cat.exec(spark, "INSERT INTO ra VALUES (1)", batchId = Some(0L))
    cat.exec(spark, "INSERT INTO rb VALUES (2)", batchId = Some(0L))
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE ra RENAME TO rb")
    }
    cat.exec(spark, "CREATE VIEW rv AS SELECT k FROM ra")
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE rb RENAME TO rv")
    }
    // a view references ra — renaming ra would break it: refuse
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE ra RENAME TO ra9")
    }
    assert(e.getMessage.contains("rv"), e.getMessage)
    // drop the view, the rename proceeds
    cat.exec(spark, "DROP VIEW rv")
    cat.exec(spark, "ALTER TABLE ra RENAME TO ra9")
    assert(cat.query(spark, "SELECT COUNT(*) AS c FROM ra9")
      .head().getLong(0) == 1L)
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE nosuch RENAME TO x")
    }
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE rb RENAME TO _catalog")
    }
  }

  test("the old name is reserved while the renamed table lives; " +
      "dropping it frees the name (dead tombstone cleared on CREATE)") {
    val (cat, _) = freshCat()
    cat.exec(spark, "CREATE TABLE tz (k BIGINT) USING graft_store")
    cat.exec(spark, "INSERT INTO tz VALUES (1)", batchId = Some(0L))
    cat.exec(spark, "ALTER TABLE tz RENAME TO tz2")
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE TABLE tz (x STRING) USING graft_store")
    }
    assert(e.getMessage.contains("reserved by its rename"),
      e.getMessage)
    cat.exec(spark, "DROP TABLE tz2")
    // name free again: the dead tombstone clears, the directory was
    // removed by the drop — a brand-new table is born clean
    cat.exec(spark, "CREATE TABLE tz (x STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO tz VALUES ('fresh')",
      batchId = Some(0L))
    assert(cat.query(spark, "SELECT x FROM tz").as[String]
      .collect().toSeq == Seq("fresh"))
  }

  test("crash-order safety: a pre-published new pointer (crash after " +
      "step 1) re-runs to completion; a tombstone with the old " +
      "pointer still present (crash between 2 and 3) already refuses " +
      "the old name — tombstone check precedes the pointer read") {
    val (cat, base) = freshCat()
    cat.exec(spark, "CREATE TABLE cr (k BIGINT) USING graft_store")
    cat.exec(spark, "INSERT INTO cr VALUES (1)", batchId = Some(0L))
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    // simulate crash after step 1: new pointer exists, no tombstone,
    // old pointer intact — both names transitional
    AtomicCreate.publish(f,
      new org.apache.hadoop.fs.Path(s"$base/_catalog/cr2"),
      s"$base/cr".getBytes("UTF-8"))
    // re-run completes the migration idempotently
    cat.exec(spark, "ALTER TABLE cr RENAME TO cr2")
    assert(cat.query(spark, "SELECT COUNT(*) AS c FROM cr2")
      .head().getLong(0) == 1L)
    intercept[IllegalArgumentException] {
      cat.query(spark, "SELECT * FROM cr")
    }
    // simulate crash between 2 and 3 on another table: tombstone
    // published, old pointer NOT yet deleted — old name must already
    // refuse (fresh catalog: no registry warm-start)
    cat.exec(spark, "CREATE TABLE cs (k BIGINT) USING graft_store")
    cat.exec(spark, "INSERT INTO cs VALUES (1)", batchId = Some(0L))
    AtomicCreate.replacePublish(f,
      new org.apache.hadoop.fs.Path(s"$base/_catalog/_renamed/cs"),
      "cs2".getBytes("UTF-8"))
    AtomicCreate.publish(f,
      new org.apache.hadoop.fs.Path(s"$base/_catalog/cs2"),
      s"$base/cs".getBytes("UTF-8"))
    val cat2 = new StoreCatalog(base)
    val e = intercept[IllegalArgumentException] {
      cat2.query(spark, "SELECT * FROM cs")
    }
    assert(e.getMessage.contains("renamed to 'cs2'"), e.getMessage)
    assert(cat2.query(spark, "SELECT COUNT(*) AS c FROM cs2")
      .head().getLong(0) == 1L)
    // the stale old pointer must not LIST (phantom name, forever),
    // and re-running the rename COMPLETES the migration — deleting
    // the leftover pointer — instead of tripping on its own
    // forwarding hint
    assert(!cat2.listTables(spark).contains("cs"),
      cat2.listTables(spark).mkString(", "))
    cat2.exec(spark, "ALTER TABLE cs RENAME TO cs2")
    assert(!f.exists(
      new org.apache.hadoop.fs.Path(s"$base/_catalog/cs")))
    assert(cat2.query(spark, "SELECT COUNT(*) AS c FROM cs2")
      .head().getLong(0) == 1L)
    // and a mismatched pointer pair refuses (fail-safe): forward a
    // tombstone at a name whose pointer addresses a DIFFERENT path
    cat2.exec(spark, "CREATE TABLE ct (k BIGINT) USING graft_store")
    cat2.exec(spark, "CREATE TABLE ct2 (k BIGINT) USING graft_store")
    AtomicCreate.replacePublish(f,
      new org.apache.hadoop.fs.Path(s"$base/_catalog/_renamed/ct"),
      "ct2".getBytes("UTF-8"))
    AtomicCreate.publish(f,
      new org.apache.hadoop.fs.Path(s"$base/_catalog/ct"),
      s"$base/ct".getBytes("UTF-8"))
    AtomicCreate.publish(f,
      new org.apache.hadoop.fs.Path(s"$base/_catalog/ct2"),
      s"$base/ct2".getBytes("UTF-8"))
    val cat3 = new StoreCatalog(base)
    val e2 = intercept[IllegalArgumentException] {
      cat3.exec(spark, "ALTER TABLE ct RENAME TO ct2")
    }
    assert(e2.getMessage.contains("different paths"), e2.getMessage)
  }

  test("rename × dropped MV: a DROPPED materialized view's former " +
      "reference must not block the source's rename (the sidecar is " +
      "gone, not tombstoned); renaming BACK over a tombstone refuses") {
    val (cat, _) = freshCat()
    cat.exec(spark, "CREATE TABLE rm1 (k STRING, n BIGINT) " +
      "USING graft_store")
    cat.exec(spark, "INSERT INTO rm1 VALUES ('a', 1)",
      batchId = Some(0L))
    cat.exec(spark, "CREATE MATERIALIZED VIEW rmv AS " +
      "SELECT k, SUM(n) AS t FROM rm1 GROUP BY k",
      batchId = Some(100L))
    // live MV blocks the rename
    val e0 = intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE rm1 RENAME TO rm2")
    }
    assert(e0.getMessage.contains("rmv"), e0.getMessage)
    // dropped MV frees it
    cat.exec(spark, "DROP MATERIALIZED VIEW rmv")
    cat.exec(spark, "ALTER TABLE rm1 RENAME TO rm2")
    assert(cat.query(spark, "SELECT COUNT(*) AS c FROM rm2")
      .head().getLong(0) == 1L)
    // an MV over the NEW name works; renaming BACK to the
    // tombstoned old name refuses (no silent re-attach window)
    cat.exec(spark, "CREATE MATERIALIZED VIEW rmv AS " +
      "SELECT k, SUM(n) AS t FROM rm2 GROUP BY k",
      batchId = Some(101L))
    val shown = cat.exec(spark, "SHOW MATERIALIZED VIEWS")
      .select("mvName").as[String].collect().toSet
    assert(shown == Set("rmv"), shown)
    cat.exec(spark, "DROP MATERIALIZED VIEW rmv")
    val e1 = intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE rm2 RENAME TO rm1")
    }
    assert(e1.getMessage.contains("tombstone"), e1.getMessage)
  }

  test("view rename and ALTER VIEW AS: the text sidecar re-publishes; " +
      "views referencing the renamed view refuse; redefinition " +
      "validates against the live catalog") {
    val (cat, base) = freshCat()
    cat.exec(spark, "CREATE TABLE vt (k BIGINT, v STRING) " +
      "USING graft_store")
    cat.exec(spark, "INSERT INTO vt VALUES (1, 'a'), (2, 'b')",
      batchId = Some(0L))
    cat.exec(spark, "CREATE VIEW v1 AS SELECT k FROM vt WHERE k > 1")
    cat.exec(spark, "ALTER VIEW v1 RENAME TO v1r")
    assert(cat.query(spark, "SELECT * FROM v1r").count() == 1L)
    intercept[Exception] { cat.query(spark, "SELECT * FROM v1") }
    val vnames = cat.exec(spark, "SHOW VIEWS")
      .select("viewName").as[String].collect().toSet
    assert(vnames == Set("v1r"), vnames)
    // a view OVER the view blocks its rename
    cat.exec(spark, "CREATE VIEW v2 AS SELECT * FROM v1r")
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER VIEW v1r RENAME TO v1z")
    }
    assert(e.getMessage.contains("v2"), e.getMessage)
    // ALTER VIEW AS redefines in place; dependents see the new text
    cat.exec(spark, "ALTER VIEW v1r AS SELECT k FROM vt")
    assert(cat.query(spark, "SELECT * FROM v2").count() == 2L)
    // a broken redefinition refuses at DDL time, text unchanged
    intercept[Exception] {
      cat.exec(spark, "ALTER VIEW v1r AS SELECT nope FROM vt")
    }
    assert(cat.query(spark, "SELECT * FROM v1r").count() == 2L)
    // fresh catalog serves the renamed/redefined views
    val cat2 = new StoreCatalog(base)
    assert(cat2.query(spark, "SELECT * FROM v2").count() == 2L)
    // ALTER VIEW on a table refuses with the right verb
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER VIEW vt AS SELECT 1")
    }
  }
}
