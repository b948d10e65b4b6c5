package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Pins for the round-13 advisor findings — each test is the exact
  * failure the advisor described, refused or corrected.
  */
class CatalogAdviceSpec extends SparkSpec {

  import spark.implicits._

  private def freshBase(): java.nio.file.Path = {
    val p = Files.createTempDirectory("catalog-advice-")
    p.toFile.deleteOnExit()
    p
  }

  test("SHALLOW CLONE reserves '_catalog' on both ends: a clone " +
      "targeting the name-pointer directory refuses BEFORE any " +
      "sidecar lands, and listTables stays phantom-free") {
    val base = freshBase()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE src (k STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO src VALUES ('a')", batchId = Some(0L))
    intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE TABLE _catalog SHALLOW CLONE src")
    }
    intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE TABLE c2 SHALLOW CLONE _catalog")
    }
    // the pointer directory carries ONLY the real table's pointer —
    // no spec/manifest was written into it by the refused clone
    val f = new org.apache.hadoop.fs.Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inside = f.listStatus(
      new org.apache.hadoop.fs.Path(s"$base/_catalog"))
      .map(_.getPath.getName).toSet
    assert(inside == Set("src"), s"pointer dir corrupted: $inside")
    assert(cat.listTables(spark) == Seq("src"))
    // a fresh catalog still resolves cleanly
    assert(new StoreCatalog(base.toString)
      .query(spark, "SELECT k FROM src").count() == 1)
  }

  test("SHALLOW CLONE VERSION AS OF validates the cloned snapshot " +
      "against checks added AFTER that version — a clone cannot be " +
      "born violating its own write gates") {
    val base = freshBase()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE vsrc (k STRING, n INT) " +
      "USING graft_store")
    cat.exec(spark, "INSERT INTO vsrc VALUES ('a', -1)",
      batchId = Some(0L)) // v2: holds a row the LATER check forbids
    // CoW delete removes the violating row, THEN the check is added
    // (valid against current rows)
    cat.exec(spark, "DELETE FROM vsrc WHERE n < 0", batchId = Some(1L))
    cat.exec(spark, "INSERT INTO vsrc VALUES ('b', 5)",
      batchId = Some(2L))
    cat.exec(spark,
      "ALTER TABLE vsrc ADD CONSTRAINT n_pos CHECK (n > 0)")
    // cloning v2 would copy n_pos onto rows that violate it: refused,
    // and the refused clone leaves nothing behind
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark, "CREATE TABLE vcl SHALLOW CLONE vsrc " +
        "VERSION AS OF 2")
    }
    assert(e.getMessage.contains("n_pos"))
    assert(!cat.listTables(spark).contains("vcl"))
    val f = new org.apache.hadoop.fs.Path(base.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$base/vcl")))
    // a version that satisfies the check clones fine — and the copied
    // gate is live on the clone
    cat.exec(spark, "CREATE TABLE vcl SHALLOW CLONE vsrc " +
      "VERSION AS OF 4")
    assert(cat.query(spark, "SELECT k, n FROM vcl")
      .as[(String, Int)].collect().toSet == Set(("b", 5)))
    intercept[IllegalArgumentException] {
      cat.exec(spark, "INSERT INTO vcl VALUES ('z', -9)",
        batchId = Some(100L))
    }
  }

  test("a truncating-but-non-null DEFAULT cast refuses at DDL time: " +
      "INT DEFAULT 1.5 would silently fill 1") {
    val base = freshBase()
    val cat = new StoreCatalog(base.toString)
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark,
        "CREATE TABLE hop (hops INT DEFAULT 1.5) USING graft_store")
    }
    assert(e.getMessage.contains("losslessly"))
    // string-typed truncation refuses too ('1.5' → 1)
    intercept[IllegalArgumentException] {
      cat.exec(spark,
        "CREATE TABLE hop (hops INT DEFAULT '1.5') USING graft_store")
    }
    // genuinely lossless cross-type defaults still pass: 1.0 → INT
    // round-trips, INT literal → BIGINT column widens
    cat.exec(spark,
      "CREATE TABLE ok (a INT DEFAULT 1.0, b BIGINT DEFAULT 7) " +
        "USING graft_store")
    cat.exec(spark, "INSERT INTO ok (a) VALUES (3)", batchId = Some(0L))
    assert(cat.query(spark, "SELECT a, b FROM ok")
      .as[(Int, Long)].collect().toSeq == Seq((3, 7L)))
    // the same probe guards ALTER COLUMN SET DEFAULT
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE ok ALTER COLUMN a SET DEFAULT 2.5")
    }
  }

  test("concurrent spec edits REBASE instead of last-writer-wins: a " +
      "catalog holding a stale handle publishes its ALTER on top of " +
      "the newest generation, so both changes survive re-attach") {
    val base = freshBase()
    val cat1 = new StoreCatalog(base.toString)
    cat1.exec(spark,
      "CREATE TABLE t (k STRING, n INT) USING graft_store")
    // cat2 attaches NOW — its in-memory knob/meta snapshot is about
    // to go stale
    val cat2 = new StoreCatalog(base.toString)
    assert(cat2.query(spark, "SELECT * FROM t").columns.contains("n"))
    // cat1 publishes a knob change cat2 never sees in memory
    cat1.exec(spark,
      "ALTER TABLE t SET TBLPROPERTIES ('statsColumns'='n')")
    // cat2's column-metadata edit must NOT revert cat1's knobs
    cat2.exec(spark, "ALTER TABLE t ALTER COLUMN k SET DEFAULT 'dflt'")
    val cat3 = new StoreCatalog(base.toString)
    val props = cat3.exec(spark, "SHOW TBLPROPERTIES t")
      .as[(String, String)].collect().toMap
    assert(props.get("statsColumns").contains("n"),
      s"cat1's TBLPROPERTIES was reverted by cat2's ALTER: $props")
    cat3.exec(spark, "INSERT INTO t (n) VALUES (1)",
      batchId = Some(0L))
    assert(cat3.query(spark, "SELECT k FROM t").as[String]
      .collect().toSeq == Seq("dflt"),
      "cat2's DEFAULT was lost")
    // and the mirror order: a knob edit on a stale handle keeps the
    // freshly-published default
    val cat4 = new StoreCatalog(base.toString)
    assert(cat4.query(spark, "SELECT * FROM t").count() == 1)
    cat3.exec(spark, "ALTER TABLE t ALTER COLUMN k SET DEFAULT 'd2'")
    cat4.exec(spark,
      "ALTER TABLE t SET TBLPROPERTIES ('statsColumns'='n')")
    val cat5 = new StoreCatalog(base.toString)
    cat5.exec(spark, "INSERT INTO t (n) VALUES (2)",
      batchId = Some(1L))
    assert(cat5.query(spark, "SELECT k FROM t WHERE n = 2")
      .as[String].collect().toSeq == Seq("d2"),
      "cat3's new DEFAULT was reverted by cat4's TBLPROPERTIES")
  }

  test("RENAME COLUMN migrates catalog-owned DEFAULT/COMMENT metadata " +
      "to the new name (and a fresh catalog sees it); DROP COLUMN " +
      "purges it so a re-added same-name column cannot resurrect it") {
    val base = freshBase()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark,
      "CREATE TABLE rm (a INT, c STRING DEFAULT 'x' COMMENT 'note') " +
        "USING graft_store")
    cat.exec(spark, "ALTER TABLE rm RENAME COLUMN c TO c2")
    cat.exec(spark, "INSERT INTO rm (a) VALUES (1)", batchId = Some(0L))
    assert(cat.query(spark, "SELECT c2 FROM rm").as[String]
      .collect().toSeq == Seq("x"),
      "the DEFAULT must follow the rename")
    assert(cat.exec(spark, "SHOW CREATE TABLE rm").head().getString(0)
      .contains("c2 STRING DEFAULT 'x' COMMENT 'note'"))
    // a FRESH catalog re-attaches the migrated spec
    val cat2 = new StoreCatalog(base.toString)
    cat2.exec(spark, "INSERT INTO rm (a) VALUES (2)", batchId = Some(1L))
    assert(cat2.query(spark, "SELECT c2 FROM rm WHERE a = 2")
      .as[String].collect().toSeq == Seq("x"))
    // DROP purges: a re-added same-name column fills NULL, not 'x'
    // (re-adding a retired name needs compact() first — the store's
    // own documented field-id-less remediation)
    cat2.exec(spark, "ALTER TABLE rm DROP COLUMN c2")
    cat2.store("rm").compact(spark)
    cat2.exec(spark, "ALTER TABLE rm ADD COLUMNS (c2 STRING)")
    cat2.exec(spark, "INSERT INTO rm (a) VALUES (3)", batchId = Some(2L))
    assert(cat2.query(spark, "SELECT c2 FROM rm WHERE a = 3")
      .head().isNullAt(0),
      "a dropped column's DEFAULT must not resurrect")
  }

  test("self-referential RTAS pins SUBQUERY-EXPRESSION references at " +
      "the pre-replace version too — a scalar subquery over the " +
      "replaced table must not read the emptied post-replace state") {
    val base = freshBase()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark, "CREATE TABLE r (n INT) USING graft_store")
    cat.exec(spark, "INSERT INTO r VALUES (3), (9)", batchId = Some(0L))
    cat.exec(spark, "CREATE TABLE other (x INT) USING graft_store")
    cat.exec(spark, "INSERT INTO other VALUES (1), (2)",
      batchId = Some(1L))
    cat.exec(spark,
      """CREATE OR REPLACE TABLE r USING graft_store AS
        |SELECT x, (SELECT max(n) FROM r) AS prior_max FROM other"""
        .stripMargin, batchId = Some(2L))
    assert(cat.query(spark, "SELECT x, prior_max FROM r")
      .as[(Int, Int)].collect().toSet == Set((1, 9), (2, 9)),
      "the scalar subquery read the post-replace (emptied) state")
  }
}
