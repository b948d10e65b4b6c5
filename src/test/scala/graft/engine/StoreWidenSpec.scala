package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType,
  IntegerType, LongType}

import graft.SparkSpec

/** ALTER COLUMN TYPE widening — the fourth governed-evolution leg after
  * ADD/DROP/RENAME: a zero-row marker commit, read-side cast across
  * physical generations, versioned (time travel shows the old type),
  * narrowing refused. Mirrors Iceberg's type-promotion matrix.
  */
class StoreWidenSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(statsColumns: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      morDeleteKey: Option[String] = None): ManifestTableStore = {
    val p = Files.createTempDirectory("widen-")
    p.toFile.deleteOnExit()
    new ManifestTableStore(p.toString, partitionBy = partitionBy,
      statsColumns = statsColumns, morDeleteKey = morDeleteKey)
  }

  test("int→long widen is metadata-only and immediate: the read serves " +
      "LongType before any wide file exists, values intact, and a " +
      "post-widen append beyond int range reads across generations") {
    val store = fresh()
    store.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"), 0L)
    store.widenColumn(spark, "n", LongType)
    // declared type pins immediately — no wide physical file yet
    val after = store.read(spark)
    assert(after.schema("n").dataType == LongType)
    assert(after.select("k", "n").as[(String, Long)].collect().toSet ==
      Set(("a", 1L), ("b", 2L)))
    // a wide append lands values an int cannot hold
    store.append(Seq(("c", 5000000000L)).toDF("k", "n"), 1L)
    assert(store.read(spark).agg(sum("n")).as[Long].head() ==
      5000000003L,
      "narrow and wide physical generations must aggregate together")
    // time travel BEFORE the marker shows the old type (versioned)
    val v1 = store.readVersion(spark, 1L)
    assert(v1.schema("n").dataType == IntegerType,
      s"pre-widen version must keep IntegerType, got ${v1.schema("n")}")
  }

  test("narrowing, lateral changes, unknown/partition/MoR-key/batch_id " +
      "columns refuse; re-widening to the current type is an " +
      "idempotent no-op") {
    val store = fresh(partitionBy = Seq("k"),
      morDeleteKey = Some("m"))
    store.append(Seq(("a", 1L, 0.5f, "x")).toDF("k", "n", "f", "m"), 0L)
    // narrowing long→int
    val e1 = intercept[IllegalArgumentException] {
      store.widenColumn(spark, "n", IntegerType)
    }
    assert(e1.getMessage.contains("not a lossless widening"))
    // lateral float→decimal is lossy (binary fractions): refused
    intercept[IllegalArgumentException] {
      store.widenColumn(spark, "f", DecimalType(10, 2))
    }
    intercept[IllegalArgumentException] {
      store.widenColumn(spark, "nope", LongType)
    }
    intercept[IllegalArgumentException] { // partition column
      store.widenColumn(spark, "k", LongType)
    }
    intercept[IllegalArgumentException] { // merge-on-read key
      store.widenColumn(spark, "m", LongType)
    }
    intercept[IllegalArgumentException] {
      store.widenColumn(spark, "batch_id", LongType)
    }
    // idempotent: widening n to its CURRENT type commits nothing
    val v = store.currentVersion(spark)
    store.widenColumn(spark, "n", LongType)
    assert(store.currentVersion(spark) == v,
      "already-wide widen must be a no-op, not a marker commit")
    // float→double and long→decimal(38,0) are real widenings
    store.widenColumn(spark, "f", DoubleType)
    assert(store.read(spark).schema("f").dataType == DoubleType)
    store.widenColumn(spark, "n", DecimalType(38, 0))
    assert(store.read(spark).schema("n").dataType == DecimalType(38, 0))
  }

  test("manifest stats keep pruning across the widen with NO refresh: " +
      "a long-literal predicate skips pre-widen int dirs") {
    val store = fresh(statsColumns = Seq("n"))
    store.append((1 to 100).map(n => (s"k$n", n)).toDF("k", "n"), 0L)
    store.append((1000 to 1100).map(n => (s"k$n", n)).toDF("k", "n"), 1L)
    store.widenColumn(spark, "n", LongType)
    store.append(Seq(("big", 6000000000L)).toDF("k", "n"), 2L)
    val slice = store.readWhere(spark, "n >= 5000000000")
    assert(slice.select("k", "n").as[(String, Long)].collect().toSeq ==
      Seq(("big", 6000000000L)))
    assert(slice.inputFiles.length <
      store.read(spark).inputFiles.length,
      "pre-widen dirs' int stats must still prune the long predicate " +
        "(BigDecimal comparison is representation-free)")
    // and a narrow-range predicate still finds narrow-generation rows
    assert(store.readWhere(spark, "n >= 1050 AND n <= 1060").count()
      == 11)
  }

  test("widen composes with rename in BOTH orders: the cast follows " +
      "the column to its current name") {
    // widen then rename: marker records the OLD name, projection
    // follows the rename
    val s1 = fresh()
    s1.append(Seq(("a", 1)).toDF("k", "n"), 0L)
    s1.widenColumn(spark, "n", LongType)
    s1.renameColumn(spark, "n", "m")
    val r1 = s1.read(spark)
    assert(r1.schema("m").dataType == LongType,
      s"widen must follow the rename, got ${r1.schema("m")}")
    assert(r1.select("m").as[Long].head() == 1L)
    // rename then widen: marker records the NEW name directly
    val s2 = fresh()
    s2.append(Seq(("a", 1)).toDF("k", "n"), 0L)
    s2.renameColumn(spark, "n", "m")
    s2.widenColumn(spark, "m", LongType)
    assert(s2.read(spark).schema("m").dataType == LongType)
    // chained widen keeps only the FINAL type (casting through an
    // intermediate type would narrow already-wide data)
    s2.widenColumn(spark, "m", DecimalType(38, 0))
    assert(s2.read(spark).schema("m").dataType == DecimalType(38, 0))
  }

  test("DML rewrites materialize the wide type incrementally and " +
      "compact materializes it table-wide; the marker survives " +
      "compactSmall verbatim") {
    val store = fresh(statsColumns = Seq("n"))
    store.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"), 0L)
    store.widenColumn(spark, "n", LongType)
    // a CoW update rewrites the touched dir THROUGH the widen
    store.update(spark, "k = 'a'", Map("n" -> lit(10L)))
    assert(store.read(spark).select("k", "n").as[(String, Long)]
      .collect().toSet == Set(("a", 10L), ("b", 2L)))
    // the rewritten dir is physically long: reading it raw (no
    // projection) yields LongType
    val rewritten = store.read(spark).inputFiles
      .filter(_.contains("/update-")).map(f =>
        f.substring(0, f.lastIndexOf('/')))
    assert(rewritten.nonEmpty)
    assert(spark.read.parquet(rewritten.head).schema("n").dataType ==
      LongType, "the DML rewrite must materialize the wide type")
    // compactSmall merges small dirs but carries the widen marker
    store.append(Seq(("c", 3L)).toDF("k", "n"), 1L)
    store.compactSmall(spark, smallBytes = 1 << 30)
    assert(store.read(spark).schema("n").dataType == LongType,
      "the widen must survive incremental compaction")
    // full compact materializes table-wide; the type persists
    store.compact(spark)
    assert(store.read(spark).schema("n").dataType == LongType)
    assert(store.read(spark).select("n").as[Long].collect().toSet ==
      Set(10L, 2L, 3L))
  }

  test("CDF: a metadata-only widen between versions is an EMPTY feed " +
      "in the end version's (wide) schema, and exactly-once/replay " +
      "semantics are unaffected") {
    val store = fresh()
    store.append(Seq(("a", 1)).toDF("k", "n"), 0L)
    val vBefore = store.currentVersion(spark)
    store.widenColumn(spark, "n", LongType)
    val vAfter = store.currentVersion(spark)
    val feed = store.readChangeFeed(spark, vBefore, vAfter)
    assert(feed.count() == 0,
      "a pure widen moves no rows — the feed must be empty")
    assert(feed.schema("n").dataType == LongType,
      "the feed speaks the end version's schema")
    // the insert stream across the widen serves the wide type too
    val inc = store.readChanges(spark, vBefore, vAfter)
    assert(inc.count() == 0 && inc.schema("n").dataType == LongType)
    // replay refusal still keyed by batch id
    store.append(Seq(("b", 2L)).toDF("k", "n"), 0L)
    assert(store.read(spark).count() == 1, "replayed id must no-op")
  }

  test("SQL route: ALTER TABLE t ALTER COLUMN n TYPE BIGINT widens " +
      "through StoreSql; unsupported ALTER COLUMN forms refuse") {
    val store = fresh()
    store.append(Seq(("a", 1)).toDF("k", "n"), 0L)
    val t = Map("t" -> store)
    StoreSql.exec(spark, t, "ALTER TABLE t ALTER COLUMN n TYPE BIGINT")
    assert(store.read(spark).schema("n").dataType == LongType)
    // narrowing refused THROUGH the SQL route too
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, t, "ALTER TABLE t ALTER COLUMN n TYPE INT")
    }
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, t,
        "ALTER TABLE t ALTER COLUMN n COMMENT 'nope'")
    }
    // decimal growth as SQL
    StoreSql.exec(spark, t,
      "ALTER TABLE t ALTER COLUMN n TYPE DECIMAL(38,0)")
    assert(store.read(spark).schema("n").dataType == DecimalType(38, 0))
  }
}
