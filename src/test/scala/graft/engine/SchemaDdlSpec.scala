package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.SparkSpec

/** `ALTER TABLE ... ADD COLUMNS` as governed schema evolution: a
  * zero-row schema-marker commit exposes the new columns null-padded
  * on every existing row, idempotently and loudly.
  */
class SchemaDdlSpec extends SparkSpec {

  import spark.implicits._

  private def mkStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("ddl-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString)
    store.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"), 0L)
    store
  }

  test("ADD COLUMNS through SQL: existing rows read null-padded, the " +
      "next append can carry values, evolution composes with reads") {
    val store = mkStore()
    StoreSql.exec(spark, Map("t" -> store),
      "ALTER TABLE t ADD COLUMNS (score INT, lang STRING)")
    val afterDdl = store.read(spark)
    assert(afterDdl.columns.toSet ==
      Set("k", "n", "batch_id", "score", "lang"))
    assert(afterDdl.filter("score IS NULL AND lang IS NULL").count() == 2)
    store.append(Seq(("c", 3, 9, "en")).toDF("k", "n", "score", "lang"),
      1L)
    assert(store.read(spark).filter("score = 9").count() == 1)
    // the marker is a real commit: history advanced by one version
    assert(store.currentVersion(spark) == 3L)
  }

  test("idempotent when all columns exist with matching types; " +
      "refuses partial overlap, type changes, nesting, empty tables") {
    val store = mkStore()
    store.addColumns(spark, Seq("score" -> IntegerType))
    val v = store.currentVersion(spark)
    store.addColumns(spark, Seq("score" -> IntegerType)) // no-op
    assert(store.currentVersion(spark) == v)
    intercept[IllegalArgumentException] {
      store.addColumns(spark, Seq("score" -> StringType)) // type change
    }
    intercept[IllegalArgumentException] { // existing data column
      store.addColumns(spark, Seq("n" -> StringType))
    }
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "ALTER TABLE t ADD COLUMNS (meta.x INT)") // nested path
    }
    val empty = new ManifestTableStore(
      Files.createTempDirectory("ddl2-").toString)
    intercept[IllegalArgumentException] {
      empty.addColumns(spark, Seq("x" -> IntegerType))
    }
  }

  test("DROP COLUMN is versioned metadata: current reads hide the " +
      "column, time travel before the drop still shows it, filters " +
      "and DML on remaining columns keep working") {
    val store = mkStore() // v1: (k, n)
    StoreSql.exec(spark, Map("t" -> store),
      "ALTER TABLE t DROP COLUMN n") // v2
    assert(store.read(spark).columns.toSet == Set("k", "batch_id"))
    assert(store.readVersion(spark, 1L).columns.contains("n"),
      "the pre-drop version must still carry the column and its data")
    assert(store.readVersion(spark, 1L).filter("n = 2").count() == 1)
    // remaining-column surface unaffected
    assert(store.readWhere(spark, "k = 'a'").count() == 1)
    store.delete(spark, "k = 'b'")
    assert(store.read(spark).select("k").as[String].collect().toSet
      == Set("a"))
    // a new append without the dropped column works; querying the
    // dropped name fails like any unknown column
    store.append(Seq(Tuple1("c")).toDF("k"), 1L)
    assert(store.read(spark).count() == 2)
    intercept[Exception] { store.read(spark).select("n").collect() }
  }

  test("a dropped name is RETIRED until a compact materializes the " +
      "drop; maintenance never resurrects the column") {
    val store = mkStore()
    store.dropColumn(spark, "n")
    intercept[IllegalArgumentException] {
      store.addColumns(spark,
        Seq("n" -> org.apache.spark.sql.types.IntegerType))
    }
    // incremental compaction must NOT fold the marker away (the big
    // dirs still hold the column physically)
    store.append(Seq(Tuple1("c")).toDF("k"), 1L)
    store.compactSmall(spark, 1L << 30)
    assert(!store.read(spark).columns.contains("n"),
      "compactSmall must not resurrect a dropped column")
    // whole-table compact materializes the drop; the name frees up
    store.compact(spark)
    assert(!store.read(spark).columns.contains("n"))
    store.addColumns(spark,
      Seq("n" -> org.apache.spark.sql.types.StringType))
    assert(store.read(spark).filter("n IS NULL").count() ==
      store.read(spark).count(),
      "the re-added column starts empty — no resurrected values")
    // refusals: partition/batch_id/unknown columns
    intercept[IllegalArgumentException] {
      store.dropColumn(spark, "batch_id")
    }
    intercept[IllegalArgumentException] {
      store.dropColumn(spark, "nope")
    }
  }

  test("the schema marker survives maintenance and never surfaces as " +
      "rows: compaction folds it, counts and CDF stay row-exact") {
    val store = mkStore()
    store.addColumns(spark, Seq("score" -> IntegerType))
    assert(store.countRows(spark) == Some(2L))
    assert(store.readChanges(spark, 1, 2).count() == 0,
      "the ALTER version adds no rows to the change feed")
    store.compact(spark)
    assert(store.read(spark).count() == 2)
    assert(store.read(spark).columns.contains("score"),
      "the evolved column survives compaction")
  }

  test("RENAME COLUMN is versioned metadata: current reads serve the " +
      "new name with the old values, time travel shows the old name, " +
      "appends and chained renames compose, mixed-generation dirs " +
      "merge cleanly") {
    val store = mkStore() // k, n
    StoreSql.exec(spark, Map("t" -> store),
      "ALTER TABLE t RENAME COLUMN n TO qty")
    val cur = store.read(spark)
    assert(cur.columns.toSet == Set("k", "qty", "batch_id"))
    assert(cur.select("k", "qty").as[(String, Int)].collect().toSet ==
      Set(("a", 1), ("b", 2)), "values must survive the rename")
    // the marker is a real commit; the PRE-rename version still serves
    // the old name with its data
    assert(store.currentVersion(spark) == 2L)
    val v1 = store.readVersion(spark, 1L)
    assert(v1.columns.contains("n") && !v1.columns.contains("qty"))
    // an append under the NEW name: both physical generations coexist
    // (old files hold 'n', new hold 'qty') and read as one column
    store.append(Seq(("c", 3)).toDF("k", "qty"), 1L)
    assert(store.read(spark).select("k", "qty").as[(String, Int)]
      .collect().toSet == Set(("a", 1), ("b", 2), ("c", 3)))
    // chained rename folds in commit order
    store.renameColumn(spark, "qty", "amount")
    assert(store.read(spark).select("k", "amount").as[(String, Int)]
      .collect().toSet == Set(("a", 1), ("b", 2), ("c", 3)))
    // small-file compaction merges a mixed-generation pair; the marker
    // carries verbatim and the read stays name-correct
    store.compactSmall(spark, 1L << 30)
    assert(store.read(spark).columns.toSet ==
      Set("k", "amount", "batch_id"))
    assert(store.read(spark).select("k", "amount").as[(String, Int)]
      .collect().toSet == Set(("a", 1), ("b", 2), ("c", 3)))
  }

  test("rename resurrection guards: the old name is RETIRED (for ADD " +
      "and as a rename target) until compact materializes; partition, " +
      "batch_id, and check-referenced columns refuse") {
    val store = mkStore()
    store.renameColumn(spark, "n", "qty")
    intercept[IllegalArgumentException] { // re-ADD of the old name
      store.addColumns(spark, Seq("n" -> IntegerType))
    }
    intercept[IllegalArgumentException] { // rename ONTO the old name
      store.renameColumn(spark, "k", "n")
    }
    intercept[IllegalArgumentException] { // rename-back without compact
      store.renameColumn(spark, "qty", "n")
    }
    intercept[IllegalArgumentException] { // target already exists
      store.renameColumn(spark, "qty", "k")
    }
    intercept[IllegalArgumentException] { // unknown source
      store.renameColumn(spark, "nope", "x")
    }
    intercept[IllegalArgumentException] { // identity rename
      store.renameColumn(spark, "qty", "qty")
    }
    intercept[IllegalArgumentException] {
      store.renameColumn(spark, "batch_id", "x")
    }
    // compact materializes 'qty' physically; the old name frees up and
    // a re-add starts EMPTY — no resurrected values
    store.compact(spark)
    store.addColumns(spark, Seq("n" -> IntegerType))
    assert(store.read(spark).filter("n IS NULL").count() ==
      store.read(spark).count())
    // a partition column cannot rename (its values live in dir names)
    val pp = Files.createTempDirectory("ddl-rn-")
    pp.toFile.deleteOnExit()
    val ps = new ManifestTableStore(pp.toString,
      partitionBy = Seq("day"))
    ps.append(Seq(("d1", "a", 1)).toDF("day", "k", "n"), 0L)
    intercept[IllegalArgumentException] {
      ps.renameColumn(spark, "day", "dt")
    }
    // a registered CHECK pins its column's name
    val cs = mkStore()
    cs.addCheck(spark, "pos-n", "n > 0")
    intercept[IllegalArgumentException] {
      cs.renameColumn(spark, "n", "qty")
    }
  }

  test("DML after a rename: predicates on the NEW name rewrite " +
      "old-generation dirs (materializing the rename incrementally); " +
      "the rename window's CDF is empty") {
    import org.apache.spark.sql.functions.lit
    val store = mkStore()                 // v1: physical 'n'
    store.renameColumn(spark, "n", "qty") // v2: marker only
    assert(store.readChangeFeed(spark, 1L, 2L).count() == 0,
      "a metadata-only rename must emit no change rows")
    // UPDATE through the new name hits rows stored under the old one
    store.update(spark, "qty = 1", Map("qty" -> lit(10)))
    assert(store.read(spark).select("k", "qty").as[(String, Int)]
      .collect().toSet == Set(("a", 10), ("b", 2)))
    store.delete(spark, "qty = 2")
    assert(store.read(spark).select("k", "qty").as[(String, Int)]
      .collect().toSet == Set(("a", 10)))
    // the rewritten dir carries the new physical name: no old-name
    // column remains anywhere
    assert(store.read(spark).columns.toSet ==
      Set("k", "qty", "batch_id"))
    // an EMPTY change window also serves the renamed schema — a caller
    // selecting the new name on an unchanged window must not get
    // UNRESOLVED_COLUMN
    val v = store.currentVersion(spark)
    val empty = store.readChanges(spark, v, v)
    assert(empty.columns.contains("qty") && !empty.columns.contains("n"))
    assert(empty.count() == 0)
  }

  test("ANALYZE TABLE COMPUTE STATISTICS restores data skipping on a " +
      "renamed column: pre-rename dirs prune again, no data rewritten") {
    val p = Files.createTempDirectory("ddl-an-")
    p.toFile.deleteOnExit()
    val before = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    before.append((1 to 100).map(i => (s"k$i", i)).toDF("k", "n"), 0L)
    before.append((1000 to 1100).map(i => (s"k$i", i)).toDF("k", "n"), 1L)
    before.renameColumn(spark, "n", "qty")
    // the handle whose statsColumns name the CURRENT schema
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("qty"))
    // pre-refresh: old dirs' stats are keyed to 'n' — a qty predicate
    // cannot prune them (conservative: both dirs open)
    val beforeFiles = store.readWhere(spark, "qty >= 1000").inputFiles
    assert(beforeFiles.exists(_.contains("batch-0")),
      "before ANALYZE, the out-of-range dir is conservatively read")
    val dirsBefore = store.read(spark).inputFiles.toSet
    StoreSql.exec(spark, Map("t" -> store),
      "ANALYZE TABLE t COMPUTE STATISTICS")
    // post-refresh: stats live under 'qty'; batch-0 (1..100) prunes
    val afterFiles = store.readWhere(spark, "qty >= 1000").inputFiles
    assert(afterFiles.nonEmpty && afterFiles.forall(_.contains("batch-1")),
      s"after ANALYZE, only batch-1 may open, got ${afterFiles.toSeq}")
    assert(store.readWhere(spark, "qty >= 1000").count() == 101)
    // metadata-only: the data dirs are byte-identical
    assert(store.read(spark).inputFiles.toSet == dirsBefore,
      "a stats refresh must not rewrite or move any data file")
    // the refresh is a real commit but ancestry-neutral: history grew
    assert(store.currentVersion(spark) == 4L)
  }
}
