package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** GENERATED ALWAYS AS IDENTITY: ids allocate from a committed
  * high-water-mark ledger (monotonic, gap-tolerant — Delta's contract)
  * and fill distributively at the SQL INSERT boundary.
  */
class IdentitySpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(): (StoreCatalog, String) = {
    val p = Files.createTempDirectory("identity-")
    p.toFile.deleteOnExit()
    (new StoreCatalog(p.toString), p.toString)
  }

  test("ids are unique and range-bounded across inserts, a replayed " +
      "batch keeps existing ids stable (gap, no reuse), START/INCREMENT " +
      "honored, and the spec survives a fresh catalog") {
    val (cat, base) = freshCat()
    cat.exec(spark,
      """CREATE TABLE idt (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100
        |    INCREMENT BY 10),
        |  v STRING) USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO idt (v) VALUES ('a'), ('b'), ('c')",
      batchId = Some(0L))
    val first = cat.query(spark, "SELECT id, v FROM idt ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(first.map(_._1) == Seq(100L, 110L, 120L), first)
    // positional INSERT omits the identity column naturally
    cat.exec(spark, "INSERT INTO idt VALUES ('d'), ('e')",
      batchId = Some(1L))
    val all = cat.query(spark, "SELECT id FROM idt").as[Long]
      .collect().toSeq
    assert(all.distinct.size == all.size, s"collision: $all")
    assert(all.size == 5 && all.forall(id =>
      id >= 100 && (id - 100) % 10 == 0))
    // replay: the same statement+batchId is a no-op — ids unchanged
    // (the re-reserved range becomes a gap, Delta's allowed shape)
    cat.exec(spark, "INSERT INTO idt VALUES ('d'), ('e')",
      batchId = Some(1L))
    assert(cat.query(spark, "SELECT id FROM idt").as[Long]
      .collect().toSeq.sorted == all.sorted)
    // a FRESH catalog re-attaches the identity spec from the sidecar
    // and keeps allocating monotonically above everything committed
    val cat2 = new StoreCatalog(base)
    cat2.exec(spark, "INSERT INTO idt (v) VALUES ('f')",
      batchId = Some(2L))
    val ids2 = cat2.query(spark, "SELECT id FROM idt").as[Long]
      .collect().toSeq
    assert(ids2.distinct.size == 6)
    assert(ids2.max > all.max)
    // SHOW CREATE TABLE round-trips the declaration
    val ddl = cat2.exec(spark, "SHOW CREATE TABLE idt")
      .head().getString(0)
    assert(ddl.contains(
      "GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 10)"),
      ddl)
  }

  test("ALWAYS means always: supplied values refuse on INSERT (list " +
      "and positional full-width), UPDATE cannot assign the column, " +
      "MERGE into an identity table refuses with the routing hint") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE ig (id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  v STRING) USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO ig (v) VALUES ('a')", batchId = Some(0L))
    intercept[IllegalArgumentException] {
      cat.exec(spark, "INSERT INTO ig (id, v) VALUES (7, 'x')",
        batchId = Some(1L))
    }
    intercept[IllegalArgumentException] {
      cat.exec(spark, "UPDATE ig SET id = 9 WHERE v = 'a'")
    }
    Seq((1L, "z")).toDF("id", "v").createOrReplaceTempView("ig_src")
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark,
        """MERGE INTO ig USING ig_src ON ig.id = ig_src.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin,
        batchId = Some(2L))
    }
    assert(e.getMessage.contains("IDENTITY"))
    // structural edits of the identity column refuse — a rename/drop/
    // retype through StoreSql would strand the catalog's identity
    // registry (INSERT fills a column the table no longer has)
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE ig RENAME COLUMN id TO id2")
    }
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE ig DROP COLUMN id")
    }
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE ig ALTER COLUMN id TYPE DECIMAL(38,0)")
    }
    // and the table still works after the refusals
    cat.exec(spark, "INSERT INTO ig (v) VALUES ('b')",
      batchId = Some(3L))
    assert(cat.query(spark, "SELECT count(DISTINCT id) FROM ig")
      .head().getLong(0) == 2L)
    // a NON-DETERMINISTIC source is pinned before counting: the
    // reserved range always covers exactly the committed rows
    cat.exec(spark,
      "INSERT INTO ig (v) SELECT CAST(id AS STRING) FROM range(200) " +
        "WHERE rand(7) < 0.5", batchId = Some(4L))
    val idsAfter = cat.query(spark, "SELECT id FROM ig")
      .as[Long].collect().toSeq
    assert(idsAfter.distinct.size == idsAfter.size)
    // declaration-time refusals: non-BIGINT (BY DEFAULT is supported
    // since round 14 — see the BY DEFAULT cases below)
    intercept[IllegalArgumentException] {
      cat.exec(spark,
        "CREATE TABLE bad2 (id INT GENERATED ALWAYS AS IDENTITY, " +
          "v STRING) USING graft_store")
    }
  }

  test("concurrent writers allocate DISJOINT ranges: the ledger's " +
      "create-if-absent race never hands out overlapping ids") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE cf (id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  v STRING) USING graft_store""".stripMargin)
    val store = cat.store("cf")
    // hammer the allocator from many threads, varying sizes
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val futs = (1 to 16).map { i =>
      Future(store.allocateIdentity(spark, "id", n = (i % 5) + 1,
        start = 1L, step = 1L) -> ((i % 5) + 1).toLong)
    }
    val ranges = Await.result(Future.sequence(futs), 120.seconds)
    val ids = ranges.flatMap { case (b, n) => b until (b + n) }
    assert(ids.distinct.size == ids.size,
      s"overlapping ranges: ${ranges.sortBy(_._1)}")
    // and through the SQL surface, interleaved inserts stay unique
    (0 until 4).foreach { i =>
      cat.exec(spark, s"INSERT INTO cf (v) VALUES ('r$i'), ('s$i')",
        batchId = Some(10L + i))
    }
    val all = cat.query(spark, "SELECT id FROM cf").as[Long]
      .collect().toSeq
    assert(all.distinct.size == all.size && all.size == 8)
  }

  test("SHALLOW CLONE seeds the clone's identity ledger: the clone's " +
      "first INSERT continues strictly above every inherited id — " +
      "never a reissue — and source/clone diverge without collisions " +
      "inside each table") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE isrc (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100
        |    INCREMENT BY 10),
        |  v STRING) USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO isrc (v) VALUES ('a'), ('b'), ('c')",
      batchId = Some(0L))
    cat.exec(spark, "CREATE TABLE icl SHALLOW CLONE isrc")
    // the defect this pins: without the seeded ledger the clone's
    // first INSERT restarts at START WITH and reissues 100/110/120.
    // (Fresh batch id — the clone refuses appends under an id it
    // inherited from the source.)
    cat.exec(spark, "INSERT INTO icl (v) VALUES ('d'), ('e')",
      batchId = Some(50L))
    val cloneIds = cat.query(spark, "SELECT id FROM icl").as[Long]
      .collect().toSeq
    assert(cloneIds.size == 5 && cloneIds.distinct.size == 5,
      s"clone reissued inherited ids: $cloneIds")
    val inheritedMax = 120L
    val newOnClone = cloneIds.filterNot(Seq(100L, 110L, 120L).contains)
    assert(newOnClone.forall(_ > inheritedMax),
      s"clone ids not above the source watermark: $newOnClone")
    // the source keeps its own ledger: its next insert is unique
    // WITHIN the source (cross-table overlap with the clone is fine —
    // they are independent tables from the clone point)
    cat.exec(spark, "INSERT INTO isrc (v) VALUES ('f')",
      batchId = Some(1L))
    val srcIds = cat.query(spark, "SELECT id FROM isrc").as[Long]
      .collect().toSeq
    assert(srcIds.size == 4 && srcIds.distinct.size == 4, srcIds)
    // a VERSIONED clone (pre-insert snapshot) still seeds the CURRENT
    // watermark — fewer inherited rows, ids start above everything
    cat.exec(spark,
      "CREATE TABLE icl1 SHALLOW CLONE isrc VERSION AS OF 2")
    cat.exec(spark, "INSERT INTO icl1 (v) VALUES ('g')",
      batchId = Some(51L))
    val v1Ids = cat.query(spark, "SELECT id FROM icl1").as[Long]
      .collect().toSeq
    assert(v1Ids.distinct.size == v1Ids.size,
      s"versioned clone reissued ids: $v1Ids")
    assert(v1Ids.max > srcIds.max, s"$v1Ids vs ${srcIds.max}")
  }

  test("REPLACE TABLE resets the identity ledger to the new START; a " +
      "stale ledger from a crashed earlier create never overrides a " +
      "fresh declaration's START") {
    val (cat, base) = freshCat()
    cat.exec(spark,
      """CREATE TABLE ir (id BIGINT GENERATED ALWAYS AS IDENTITY
        |  (START WITH 1 INCREMENT BY 1), v STRING)
        |USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO ir (v) VALUES ('a'), ('b')",
      batchId = Some(0L))
    cat.exec(spark,
      """CREATE OR REPLACE TABLE ir (id BIGINT GENERATED ALWAYS AS
        |  IDENTITY (START WITH 500 INCREMENT BY 1), v STRING)
        |USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO ir (v) VALUES ('c')",
      batchId = Some(1L))
    val ids = cat.query(spark, "SELECT id FROM ir").as[Long]
      .collect().toSeq
    assert(ids == Seq(500L), s"REPLACE did not reset the ledger: $ids")
    // crashed-create residue: an identity ledger left at a path with
    // ZERO committed versions (allocation publishes ledger files
    // independently of manifest commits) — the fresh CREATE resets it
    val stale = new org.apache.hadoop.fs.Path(
      s"$base/irx/identity/id/r0")
    val f = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicCreate.publish(f, stale, "9000:50".getBytes("UTF-8"))
    cat.exec(spark,
      """CREATE TABLE irx (id BIGINT GENERATED ALWAYS AS IDENTITY
        |  (START WITH 7 INCREMENT BY 1), v STRING)
        |USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO irx (v) VALUES ('z')",
      batchId = Some(0L))
    assert(cat.query(spark, "SELECT id FROM irx").as[Long]
      .collect().toSeq == Seq(7L))
  }

  test("GENERATED BY DEFAULT AS IDENTITY: explicit ids are admitted " +
      "and bump the ledger past the batch maximum, omitted inserts " +
      "still allocate, NULL ids refuse, UPDATE still cannot assign, " +
      "and SHOW CREATE TABLE round-trips BY DEFAULT") {
    val (cat, base) = freshCat()
    cat.exec(spark,
      """CREATE TABLE bd (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 10
        |    INCREMENT BY 10),
        |  v STRING) USING graft_store""".stripMargin)
    // omitted: allocates 10, 20
    cat.exec(spark, "INSERT INTO bd (v) VALUES ('a'), ('b')",
      batchId = Some(0L))
    // explicit: admitted verbatim, bumps the watermark past 7000
    cat.exec(spark,
      "INSERT INTO bd (id, v) VALUES (7000, 'x'), (6995, 'y')",
      batchId = Some(1L))
    // omitted again: must land strictly above 7000, on the grid
    cat.exec(spark, "INSERT INTO bd (v) VALUES ('c')",
      batchId = Some(2L))
    val ids = cat.query(spark, "SELECT id FROM bd ORDER BY id")
      .as[Long].collect().toSeq
    assert(ids.size == 5 && ids.distinct.size == 5, ids)
    assert(ids.take(2) == Seq(10L, 20L), ids)
    assert(ids.contains(7000L) && ids.contains(6995L), ids)
    assert(ids.max > 7000L, s"generated id did not clear the " +
      s"explicit maximum: $ids")
    // NULL explicit id refuses (the column was supplied)
    intercept[IllegalArgumentException] {
      cat.exec(spark,
        "INSERT INTO bd (id, v) VALUES (CAST(NULL AS BIGINT), 'n')",
        batchId = Some(3L))
    }
    // UPDATE cannot assign identity, BY DEFAULT included
    intercept[IllegalArgumentException] {
      cat.exec(spark, "UPDATE bd SET id = 1 WHERE v = 'a'")
    }
    val ddl = cat.exec(spark, "SHOW CREATE TABLE bd")
      .head().getString(0)
    assert(ddl.contains(
      "GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT " +
        "BY 10)"), ddl)
    // the BY DEFAULT flag survives a fresh catalog (sidecar round-trip)
    val cat2 = new StoreCatalog(base)
    cat2.exec(spark, "INSERT INTO bd (id, v) VALUES (9000, 'z')",
      batchId = Some(4L))
    cat2.exec(spark, "INSERT INTO bd (v) VALUES ('w')",
      batchId = Some(5L))
    val ids2 = cat2.query(spark, "SELECT id FROM bd").as[Long]
      .collect().toSeq
    assert(ids2.distinct.size == ids2.size && ids2.max > 9000L, ids2)
  }

  test("MERGE into a BY DEFAULT identity table works when the source " +
      "carries ids (ledger bumps past them); ALWAYS still refuses") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE mbd (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
        |  v STRING) USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO mbd (v) VALUES ('a')",
      batchId = Some(0L))
    Seq((500L, "up"), (600L, "new")).toDF("id", "v")
      .createOrReplaceTempView("mbd_src")
    cat.exec(spark,
      """MERGE INTO mbd USING mbd_src ON mbd.id = mbd_src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      batchId = Some(1L))
    // generated ids now clear the merged maximum
    cat.exec(spark, "INSERT INTO mbd (v) VALUES ('b')",
      batchId = Some(2L))
    val ids = cat.query(spark, "SELECT id FROM mbd").as[Long]
      .collect().toSeq
    assert(ids.size == 4 && ids.distinct.size == 4, ids)
    assert(ids.max > 600L, ids)
    // a source WITHOUT the id column refuses with the by-name hint
    Seq(("q")).toDF("v").createOrReplaceTempView("mbd_src2")
    val e = intercept[IllegalArgumentException] {
      cat.exec(spark,
        """MERGE INTO mbd USING mbd_src2 ON mbd.v = mbd_src2.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        batchId = Some(3L))
    }
    assert(e.getMessage.contains("carry the id column"), e.getMessage)
    // the SOUNDNESS edge: explicit clauses could write ids the
    // source-extremum bump never saw — SET id and explicit INSERT
    // lists refuse; star forms are the covered surface
    val e2 = intercept[IllegalArgumentException] {
      cat.exec(spark,
        """MERGE INTO mbd USING mbd_src ON mbd.id = mbd_src.id
          |WHEN MATCHED THEN UPDATE SET id = 9999999"""
          .stripMargin, batchId = Some(4L))
    }
    assert(e2.getMessage.contains("cannot be assigned"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      cat.exec(spark,
        """MERGE INTO mbd USING mbd_src ON mbd.id = mbd_src.id
          |WHEN NOT MATCHED THEN INSERT (id, v)
          |  VALUES (9999999, mbd_src.v)""".stripMargin,
        batchId = Some(5L))
    }
    assert(e3.getMessage.contains("INSERT *"), e3.getMessage)
    // and a general-path clause that touches only NON-identity
    // columns still merges fine (UPDATE-only CDC shape)
    cat.exec(spark,
      """MERGE INTO mbd USING mbd_src ON mbd.id = mbd_src.id
        |WHEN MATCHED THEN UPDATE SET v = mbd_src.v"""
        .stripMargin, batchId = Some(6L))
    assert(cat.query(spark, "SELECT COUNT(DISTINCT id) FROM mbd")
      .head().getLong(0) == 4L)
  }

  test("ALTER TABLE ... SYNC IDENTITY re-derives the watermark from " +
      "the data after an out-of-band load bypassed the write boundary") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE sy (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
        |  v STRING) USING graft_store""".stripMargin)
    cat.exec(spark, "INSERT INTO sy (v) VALUES ('a')",
      batchId = Some(0L))
    // out-of-band: a direct store append that never consults the
    // ledger (the restored-backup / external-writer shape)
    cat.store("sy").append(
      Seq((4000L, "oob")).toDF("id", "v"), batchId = 100L)
    // without sync the next generated id would collide risk-free only
    // by luck; SYNC re-reads MAX(id) and bumps
    cat.exec(spark, "ALTER TABLE sy SYNC IDENTITY")
    cat.exec(spark, "INSERT INTO sy (v) VALUES ('b')",
      batchId = Some(1L))
    val ids = cat.query(spark, "SELECT id FROM sy").as[Long]
      .collect().toSeq
    assert(ids.size == 3 && ids.distinct.size == 3 && ids.max > 4000L,
      ids)
    // column-scoped form + refusals
    cat.exec(spark, "ALTER TABLE sy ALTER COLUMN id SYNC IDENTITY")
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE sy ALTER COLUMN v SYNC IDENTITY")
    }
    cat.exec(spark, "CREATE TABLE plain (x BIGINT) USING graft_store")
    intercept[IllegalArgumentException] {
      cat.exec(spark, "ALTER TABLE plain SYNC IDENTITY")
    }
  }

  test("concurrent explicit and generated writers never collide: the " +
      "bump and the allocation race on the same create-if-absent ledger") {
    val (cat, _) = freshCat()
    cat.exec(spark,
      """CREATE TABLE cx (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
        |  v STRING) USING graft_store""".stripMargin)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // 8 writers: evens insert explicit ids in a WIDELY-SPACED far
    // band (a generated id lands at most a few steps past the last
    // bump, so wide spacing keeps it off every future explicit — the
    // documented BY DEFAULT contract: the ledger protects against
    // PAST explicits; adjacent future explicits are the user's to
    // avoid, exactly Delta's caveat), odds let the engine allocate
    val futs = (0 until 8).map { i =>
      Future {
        if (i % 2 == 0)
          cat.exec(spark,
            s"INSERT INTO cx (id, v) VALUES (${1000000 + i * 1000}, " +
              s"'e$i')",
            batchId = Some(10L + i))
        else
          cat.exec(spark, s"INSERT INTO cx (v) VALUES ('g$i')",
            batchId = Some(10L + i))
      }
    }
    Await.result(Future.sequence(futs), 300.seconds)
    val ids = cat.query(spark, "SELECT id FROM cx").as[Long]
      .collect().toSeq
    assert(ids.size == 8 && ids.distinct.size == 8, ids.sorted)
  }
}
