package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** SQL-text time travel ([[StoreSql.query]]): Spark's parsed
  * `VERSION AS OF` / `TIMESTAMP AS OF` clause routed to the manifest
  * store's version/tag/timestamp reads — and the refusal surface for
  * unknown refs.
  */
class SqlTimeTravelSpec extends SparkSpec {

  import spark.implicits._

  private def mkStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("sqltt-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString)
    store.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"), 0L) // v1
    store.append(Seq(("c", 3)).toDF("k", "n"), 1L)           // v2
    store.append(Seq(("d", 4)).toDF("k", "n"), 2L)           // v3
    store
  }

  private def ks(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  test("VERSION AS OF n reads the manifest version; the bare name " +
      "reads current state; both compose in one statement") {
    val store = mkStore()
    val t = Map("t" -> store)
    assert(ks(StoreSql.query(spark, t,
      "SELECT k FROM t VERSION AS OF 1")) == Set("a", "b"))
    assert(ks(StoreSql.query(spark, t,
      "SELECT k FROM t VERSION AS OF 2")) == Set("a", "b", "c"))
    assert(ks(StoreSql.query(spark, t,
      "SELECT k FROM t")) == Set("a", "b", "c", "d"))
    // current state anti-joined to a historical version = the delta
    assert(ks(StoreSql.query(spark, t,
      """SELECT cur.k FROM t cur
        |LEFT ANTI JOIN t VERSION AS OF 2 old ON cur.k = old.k"""
        .stripMargin)) == Set("d"))
  }

  test("VERSION AS OF 'name' resolves a TAG or a BRANCH head " +
      "(Iceberg's unified ref namespace); unknown refs and versions " +
      "refuse") {
    val store = mkStore()
    store.tag(spark, "audit", 2L)
    val t = Map("t" -> store)
    assert(ks(StoreSql.query(spark, t,
      "SELECT k FROM t VERSION AS OF 'audit'")) == Set("a", "b", "c"))
    // a branch head resolves through the same slot
    store.createBranch(spark, "wip", 2L)
    store.branch("wip").append(Seq(("z", 9)).toDF("k", "n"), 7L)
    assert(ks(StoreSql.query(spark, t,
      "SELECT k FROM t VERSION AS OF 'wip'")) == Set("a", "b", "c", "z"))
    intercept[IllegalArgumentException] {
      StoreSql.query(spark, t,
        "SELECT k FROM t VERSION AS OF 'no-such-ref'").collect()
    }
    intercept[IllegalArgumentException] {
      StoreSql.query(spark, t,
        "SELECT k FROM t VERSION AS OF 99").collect()
    }
  }

  test("TIMESTAMP AS OF resolves Delta-style to the latest version " +
      "committed at or before the instant; pre-history refuses") {
    val store = mkStore()
    val t = Map("t" -> store)
    // pin distinct commit times (the test VM can publish all three
    // versions inside one millisecond)
    val p = store.read(spark).inputFiles.head
      .replaceAll("/data/.*", "")
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val base = 1700000000000L // 2023-11-14 22:13:20 UTC
    (1 to 3).foreach { v =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$p/manifest/v$v"),
        base + v * 3600000L, -1)
    }
    def at(ts: String): Set[String] = ks(StoreSql.query(spark, t,
      s"SELECT k FROM t TIMESTAMP AS OF '$ts'"))
    assert(at("2023-11-14 23:30:00") == Set("a", "b")) // after v1 only
    assert(at("2023-11-15 00:13:20") == Set("a", "b", "c")) // == v2
    assert(at("2026-01-01 00:00:00") == Set("a", "b", "c", "d"))
    intercept[IllegalArgumentException] {
      at("2020-01-01 00:00:00") // before the first commit
    }
    // versionTimestampMs round-trips: AS OF v2's own commit time = v2
    val t2 = store.versionTimestampMs(spark, 2L)
    assert(ks(StoreSql.query(spark, t,
      s"SELECT k FROM t TIMESTAMP AS OF " +
        s"timestamp_millis(${t2}L)")) == Set("a", "b", "c"))
  }

  test("non-store relations with time travel fall through to the " +
      "analyzer's own error; non-store names resolve normally") {
    val store = mkStore()
    Seq(("x", 9)).toDF("k", "n").createOrReplaceTempView("plainview")
    // a store query can join a catalog view untouched
    assert(ks(StoreSql.query(spark, Map("t" -> store),
      "SELECT k FROM plainview")) == Set("x"))
    intercept[Exception] { // temp views don't support time travel
      StoreSql.query(spark, Map("t" -> store),
        "SELECT k FROM plainview VERSION AS OF 1").collect()
    }
  }

  test("SQL-text store reads splice as graft-store FORMAT relations " +
      "(main ref, time travel included), so the statement's WHERE " +
      "pushes into manifest pruning; branch handles stay resolved " +
      "frames") {
    val store = mkStore()
    val t = Map("t" -> store)
    def relations(sql: String) =
      StoreSql.query(spark, t, sql).queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources
            .LogicalRelation => l.relation
      }
    for (q <- Seq("SELECT k FROM t WHERE n >= 3",
        "SELECT k FROM t VERSION AS OF 2 WHERE n >= 3")) {
      val rels = relations(q)
      assert(rels.nonEmpty &&
        rels.forall(_.isInstanceOf[graft.sources.StoreRelation]),
        s"$q must read through the PrunedFilteredScan relation, " +
          s"got $rels")
    }
    // results identical to the resolved-frame reads
    assert(ks(StoreSql.query(spark, t,
      "SELECT k FROM t VERSION AS OF 2 WHERE n >= 3")) == Set("c"))
    // a registered BRANCH handle still serves the branch chain (a
    // path-only format read would wrongly serve main)
    store.createBranch(spark, "wip", 3L)
    val br = store.branch("wip")
    br.append(Seq(("z", 9)).toDF("k", "n"), 10L)
    assert(ks(StoreSql.query(spark, Map("b" -> br),
      "SELECT k FROM b")) == Set("a", "b", "c", "d", "z"))
    // ... including HISTORICAL branch versions: VERSION AS OF on the
    // branch handle reads the branch chain's own version, not main's
    val bv = br.currentVersion(spark)
    assert(ks(StoreSql.query(spark, Map("b" -> br),
      s"SELECT k FROM b VERSION AS OF $bv")) ==
      Set("a", "b", "c", "d", "z"))
  }
}
