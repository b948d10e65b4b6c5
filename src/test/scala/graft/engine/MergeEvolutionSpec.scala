package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** MERGE WITH SCHEMA EVOLUTION (Delta's autoMerge-for-MERGE): a CDC
  * batch that grew a column mid-stream evolves the target through the
  * governed ADD/WIDEN markers when the session conf is on — and REFUSES
  * (never silently drops the column) when it is off.
  */
class MergeEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(): (StoreCatalog, String) = {
    val p = Files.createTempDirectory("merge-evolve-")
    p.toFile.deleteOnExit()
    (new StoreCatalog(p.toString), p.toString)
  }

  private def withConf[T](on: Boolean)(body: => T): T = {
    val key = StoreSql.AutoMergeConf
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("conf OFF (default): a conditional-star MERGE whose source " +
      "carries a new column REFUSES loudly — by-name mapping must not " +
      "silently drop CDC data") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      "CREATE TABLE t0 (k BIGINT, v STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO t0 VALUES (1, 'a'), (2, 'b')",
      batchId = Some(0L))
    Seq((2L, "b2", 9.5), (3L, "c", 1.5))
      .toDF("k", "v", "price").createOrReplaceTempView("cdc0")
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark,
        """MERGE INTO t0 USING cdc0 ON t0.k = cdc0.k
          |WHEN MATCHED AND cdc0.v <> 'zzz' THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        batchId = Some(1L))
    }
    assert(e.getMessage.contains("price"))
    // nothing committed, no ungoverned schema change
    assert(cat.query(spark, "SELECT * FROM t0").columns.toSet ==
      Set("k", "v", "batch_id"))
    assert(cat.store("t0").currentVersion(spark) == 2L)
  }

  test("conf ON: the same MERGE auto-ADDs the new column through the " +
      "governed marker — time travel shows the pre-merge schema, " +
      "existing rows read NULL, and a BIGINT source value widens an " +
      "INT target column") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      "CREATE TABLE t1 (k BIGINT, v STRING, n INT) USING graft_store")
    cat.exec(spark,
      "INSERT INTO t1 VALUES (1, 'a', 10), (2, 'b', 20)",
      batchId = Some(0L)) // v2
    Seq((2L, "b2", 30000000000L, 9.5), (3L, "c", 40L, 1.5))
      .toDF("k", "v", "n", "price").createOrReplaceTempView("cdc1")
    withConf(on = true) {
      cat.exec(spark,
        """MERGE INTO t1 USING cdc1 ON t1.k = cdc1.k
          |WHEN MATCHED AND cdc1.v <> 'zzz' THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        batchId = Some(1L))
    }
    // evolved: price added, n widened INT→BIGINT; data correct
    val out = cat.query(spark,
      "SELECT k, v, n, price FROM t1 ORDER BY k")
      .as[(Long, String, Long, Option[Double])].collect().toSeq
    assert(out == Seq((1L, "a", 10L, None),
      (2L, "b2", 30000000000L, Some(9.5)),
      (3L, "c", 40L, Some(1.5))))
    // the pre-merge schema is pinned in history (markers + merge are
    // separate versions; v2 = the original load)
    assert(cat.query(spark, "SELECT * FROM t1 VERSION AS OF 2")
      .columns.toSet == Set("k", "v", "n", "batch_id"))
    assert(cat.query(spark,
      "SELECT n FROM t1 VERSION AS OF 2").schema.head.dataType ==
      org.apache.spark.sql.types.IntegerType)
    // replay of the same batch id is still an exactly-once no-op
    withConf(on = true) {
      cat.exec(spark,
        """MERGE INTO t1 USING cdc1 ON t1.k = cdc1.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        batchId = Some(1L))
    }
    assert(cat.query(spark, "SELECT count(*) AS c FROM t1")
      .head().getLong(0) == 3L)
  }

  test("explicit column-list clauses need no gate: a source with an " +
      "extra column merges fine when the clauses never reference it " +
      "(no star action, conf off)") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      "CREATE TABLE t2 (k BIGINT, v STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO t2 VALUES (1, 'a')", batchId = Some(0L))
    Seq((1L, "a2", 7.0), (5L, "e", 8.0))
      .toDF("k", "v", "extra").createOrReplaceTempView("cdc2")
    cat.exec(spark,
      """MERGE INTO t2 USING cdc2 ON t2.k = cdc2.k
        |WHEN MATCHED THEN UPDATE SET v = cdc2.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (cdc2.k, cdc2.v)"""
        .stripMargin, batchId = Some(1L))
    assert(cat.query(spark, "SELECT k, v FROM t2 ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2"), (5L, "e")))
    assert(cat.query(spark, "SELECT * FROM t2").columns.toSet ==
      Set("k", "v", "batch_id"))
  }

  test("generated columns keep their write gate under an evolving " +
      "MERGE: a supplied value violating the generation expression " +
      "refuses at the write choke point") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE t3 (k BIGINT, n INT,
        |  n2 INT GENERATED ALWAYS AS (n * 2)) USING graft_store"""
        .stripMargin)
    cat.exec(spark, "INSERT INTO t3 (k, n) VALUES (1, 5)",
      batchId = Some(0L))
    // the source supplies a WRONG n2 plus a new column; evolution must
    // not bypass the generation equality check
    Seq((1L, 6, 999, "x")).toDF("k", "n", "n2", "note")
      .createOrReplaceTempView("cdc3")
    withConf(on = true) {
      intercept[Exception] {
        cat.exec(spark,
          """MERGE INTO t3 USING cdc3 ON t3.k = cdc3.k
            |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
          batchId = Some(1L))
      }
    }
    // and a CONSISTENT source passes, with the new column evolved
    Seq((1L, 6, 12, "x")).toDF("k", "n", "n2", "note")
      .createOrReplaceTempView("cdc3b")
    withConf(on = true) {
      cat.exec(spark,
        """MERGE INTO t3 USING cdc3b ON t3.k = cdc3b.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
        batchId = Some(2L))
    }
    assert(cat.query(spark, "SELECT k, n, n2, note FROM t3")
      .as[(Long, Int, Int, String)].collect().toSeq ==
      Seq((1L, 6, 12, "x")))
  }

  test("explicit column-list clauses EVOLVE when they NAME a new " +
      "column (Delta's rule): UPDATE SET new_col and INSERT " +
      "(…, new_col) auto-ADD under the conf, refuse loudly without " +
      "it, and an untouched extra source column still just passes by") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      "CREATE TABLE t4 (k BIGINT, v STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO t4 VALUES (1, 'a'), (2, 'b')",
      batchId = Some(0L))
    Seq((1L, "a2", 7.5), (5L, "e", 8.5))
      .toDF("k", "v", "score").createOrReplaceTempView("cdc4")
    // conf OFF: naming the new column refuses with the remediation
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark,
        """MERGE INTO t4 USING cdc4 ON t4.k = cdc4.k
          |WHEN MATCHED THEN UPDATE SET v = cdc4.v, score = cdc4.score
          |WHEN NOT MATCHED THEN INSERT (k, v, score)
          |  VALUES (cdc4.k, cdc4.v, cdc4.score)""".stripMargin,
        batchId = Some(1L))
    }
    assert(e.getMessage.contains("score") &&
      e.getMessage.contains(StoreSql.AutoMergeConf), e.getMessage)
    assert(cat.query(spark, "SELECT * FROM t4").columns.toSet ==
      Set("k", "v", "batch_id"))
    // conf ON: the same statement auto-ADDs through the governed
    // marker; the unmatched row 2 reads NULL in the new column
    withConf(on = true) {
      cat.exec(spark,
        """MERGE INTO t4 USING cdc4 ON t4.k = cdc4.k
          |WHEN MATCHED THEN UPDATE SET v = cdc4.v, score = cdc4.score
          |WHEN NOT MATCHED THEN INSERT (k, v, score)
          |  VALUES (cdc4.k, cdc4.v, cdc4.score)""".stripMargin,
        batchId = Some(1L))
    }
    val rows = cat.query(spark,
      "SELECT k, v, score FROM t4 ORDER BY k")
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows == Seq((1L, "a2", Some(7.5)), (2L, "b", None),
      (5L, "e", Some(8.5))), rows)
    // conflicting types for the same new column across clauses refuse
    Seq((9L, "z", 1.0)).toDF("k", "v", "score")
      .createOrReplaceTempView("cdc4b")
    withConf(on = true) {
      val e2 = intercept[IllegalArgumentException] {
        cat.exec(spark,
          """MERGE INTO t4 USING cdc4b ON t4.k = cdc4b.k
            |WHEN MATCHED THEN UPDATE SET other = cdc4b.score
            |WHEN NOT MATCHED THEN INSERT (k, v, other)
            |  VALUES (cdc4b.k, cdc4b.v, CAST(1 AS STRING))"""
            .stripMargin, batchId = Some(2L))
      }
      assert(e2.getMessage.contains("conflicting types"), e2.getMessage)
    }
    // a NEW column from an untyped NULL refuses with the cast hint
    withConf(on = true) {
      val e3 = intercept[IllegalArgumentException] {
        cat.exec(spark,
          """MERGE INTO t4 USING cdc4b ON t4.k = cdc4b.k
            |WHEN NOT MATCHED THEN INSERT (k, v, hollow)
            |  VALUES (cdc4b.k, cdc4b.v, NULL)""".stripMargin,
          batchId = Some(3L))
      }
      assert(e3.getMessage.contains("untyped NULL"), e3.getMessage)
    }
  }

  test("INSERT INTO with a named column list carrying a NEW column " +
      "evolves under the conf and refuses without it (the non-MERGE " +
      "half of the explicit-list contract)") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      "CREATE TABLE t5 (k BIGINT, v STRING) USING graft_store")
    cat.exec(spark, "INSERT INTO t5 VALUES (1, 'a')", batchId = Some(0L))
    intercept[IllegalArgumentException] {
      cat.exec(spark,
        "INSERT INTO t5 (k, v, tag) VALUES (2, 'b', 'new')",
        batchId = Some(1L))
    }
    withConf(on = true) {
      cat.exec(spark,
        "INSERT INTO t5 (k, v, tag) VALUES (2, 'b', 'new')",
        batchId = Some(1L))
    }
    val rows = cat.query(spark, "SELECT k, v, tag FROM t5 ORDER BY k")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2))))
    assert(rows == Seq((1L, "a", None), (2L, "b", Some("new"))), rows)
  }
}
