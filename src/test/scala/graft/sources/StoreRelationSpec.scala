package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.engine.ManifestTableStore

/** Batch reads through `spark.read.format("graft-store")`: current
  * state, Delta-named time travel options, and pushed filters pruning
  * whole dirs through the manifest stats — behind the STANDARD API.
  */
class StoreRelationSpec extends SparkSpec {

  import spark.implicits._

  private def mkStore(): (String, ManifestTableStore) = {
    val p = Files.createTempDirectory("relstore-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    store.append((1 to 100).map(n => (n, s"v$n")).toDF("n", "v"), 0L)
    store.append((1000 to 1100).map(n => (n, s"v$n")).toDF("n", "v"), 1L)
    (p.toString, store)
  }

  test("current-state read equals store.read; filters and projections " +
      "apply through the standard API") {
    val (path, store) = mkStore()
    val df = spark.read.format("graft-store").option("path", path).load()
    assert(df.count() == store.read(spark).count())
    assert(df.filter($"n" >= 1000).count() == 101)
    assert(df.select("v").columns.toSeq == Seq("v"))
  }

  test("pushed filters prune whole dirs via manifest stats: a " +
      "range predicate never opens the out-of-range dir's files") {
    val (path, _) = mkStore()
    val scanned = spark.read.format("graft-store").option("path", path)
      .load().filter($"n" >= 1000).select("n", "v")
    assert(scanned.count() == 101)
    // the same predicate through readWhere is the pruning oracle:
    // batch-0's dir (n in [1,100]) must not be among the input files
    val files = new ManifestTableStore(path, statsColumns = Seq("n"))
      .readWhere(spark, "n >= 1000").inputFiles
    assert(files.nonEmpty && files.forall(_.contains("batch-1")),
      s"expected only batch-1 files, got ${files.toSeq}")
  }

  test("metaTable options serve the manifest-only metadata tables: " +
      "history, tags, branches") {
    val (path, store) = mkStore()
    store.tag(spark, "first", 1L)
    store.createBranch(spark, "wip", 2L)
    store.branch("wip").append(Seq((7, "x")).toDF("n", "v"), 7L)
    def meta(t: String) = spark.read.format("graft-store")
      .option("path", path).option("metaTable", t).load()
    assert(meta("history").count() == 2) // v1, v2
    assert(meta("tags").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSet == Set(("first", 1L)))
    assert(meta("branches").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSet == Set(("wip", 2L)))
    intercept[IllegalArgumentException] { meta("nope").count() }
  }

  test("vacuum dryRun reports exactly what a real run would delete, " +
      "touching nothing") {
    val (path, store) = mkStore()
    store.compact(spark) // supersedes both batch dirs
    val wouldDelete = store.vacuum(spark, retainLast = 0,
      minAgeMs = 0L, dryRun = true)
    assert(wouldDelete.size == 2,
      s"both superseded batch dirs should report: $wouldDelete")
    // nothing moved: history intact, superseded version still readable
    assert(store.readVersion(spark, 2L).count() == 201)
    val deleted = store.vacuum(spark, retainLast = 0, minAgeMs = 0L)
    assert(deleted.toSet == wouldDelete.toSet,
      "the real run must delete exactly the dry-run report")
  }

  test("filter translation renders exactly the expressible conjuncts " +
      "(the rest drop out of pruning, never out of correctness)") {
    import org.apache.spark.sql.sources._
    assert(StoreRelation.predicateSql(Array(
      GreaterThanOrEqual("n", 1000), IsNotNull("n")))
      == Some("`n` >= 1000 AND `n` IS NOT NULL"))
    assert(StoreRelation.predicateSql(Array(
      EqualTo("v", "it's"), In("n", Array(1, 2))))
      == Some("`v` = 'it''s' AND `n` IN (1, 2)"))
    assert(StoreRelation.predicateSql(Array(
      Or(LessThan("n", 5), GreaterThan("n", 10))))
      == Some("(`n` < 5 OR `n` > 10)"))
    // an untranslatable filter drops; an untranslatable OR side kills
    // the whole OR (an OR is only sound when both sides render)
    assert(StoreRelation.predicateSql(Array(
      StringContains("v", "x"), EqualTo("n", 1)))
      == Some("`n` = 1"))
    assert(StoreRelation.predicateSql(Array(
      Or(StringContains("v", "x"), EqualTo("n", 1)))) == None)
  }

  test("versionAsOf / timestampAsOf / ref options resolve history; " +
      "combining them refuses") {
    val (path, store) = mkStore()
    store.tag(spark, "first", 1L)
    val v1 = spark.read.format("graft-store").option("path", path)
      .option("versionAsOf", "1").load()
    assert(v1.count() == 100)
    val tagged = spark.read.format("graft-store").option("path", path)
      .option("ref", "first").load()
    assert(tagged.count() == 100)
    val t1 = store.versionTimestampMs(spark, 1L)
    // pin distinct commit times, then AS OF v1's instant resolves v1
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$path/manifest/v2"),
      t1 + 3600000L, -1)
    val asOf = spark.read.format("graft-store").option("path", path)
      .option("timestampAsOf",
        new java.sql.Timestamp(t1).toString).load()
    assert(asOf.count() == 100)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-store").option("path", path)
        .option("versionAsOf", "1").option("ref", "first").load()
        .count()
    }
  }

  test("pushed filters prune TIME-TRAVEL reads too: a versionAsOf / " +
      "timestampAsOf / tag read with a range predicate opens only the " +
      "stats-admitted dirs of THAT version") {
    val (path, store) = mkStore() // v1: n 1-100; v2: + n 1000-1100
    store.tag(spark, "both", 2L)
    // a third batch the historical reads must never see
    store.append((5000 to 5100).map(n => (n, s"v$n")).toDF("n", "v"), 2L)
    def readOpt(k: String, v: String) = spark.read.format("graft-store")
      .option("path", path).option(k, v).load()
      .filter($"n" >= 1000).select("n", "v")
    for ((k, value) <- Seq("versionAsOf" -> "2", "ref" -> "both")) {
      assert(readOpt(k, value).count() == 101,
        s"$k=$value must serve version 2")
    }
    // the pruning oracle (readVersionWhere is what the relation routes
    // to; the DataFrame served through the format bridges to an RDD, so
    // inputFiles must be asserted on the store read): batch-0's dir
    // (n in [1,100]) never opens, batch-2 is not in version 2 at all
    val files = store.readVersionWhere(spark, 2L, "n >= 1000").inputFiles
    assert(files.nonEmpty && files.forall(_.contains("batch-1")),
      s"only version 2's batch-1 dir may open, got ${files.toSeq}")
    // the version-bound holds under pruning: batch-2 (n 5000+) is in
    // CURRENT state, matches the predicate, and must stay invisible
    assert(readOpt("versionAsOf", "2").filter($"n" >= 5000).count() == 0)
    // correctness oracle: pruned time travel == unpruned time travel
    assert(readOpt("versionAsOf", "2").collect().toSet ==
      store.readVersion(spark, 2L).filter($"n" >= 1000)
        .select("n", "v").collect().toSet)
  }

  test("a mutable-target DataFrame (current state / ref head) serves " +
      "the SAME state on filtered and unfiltered scans after new " +
      "commits; version-pinned reads stay cached") {
    val (path, store) = mkStore()
    store.createBranch(spark, "head", 2L)
    val refDf = spark.read.format("graft-store").option("path", path)
      .option("ref", "head").load()
    assert(refDf.count() == 201)
    store.branch("head").append(
      (1 to 7).map(n => (9000 + n, s"x$n")).toDF("n", "v"), 50L)
    // BOTH scan shapes must see the new branch commit
    assert(refDf.count() == 208,
      "an unfiltered re-scan must not serve a stale cached head")
    assert(refDf.filter($"n" >= 9000).count() == 7,
      "a filtered re-scan resolves the same (fresh) state")
    // current-state reads: same freshness contract
    val cur = spark.read.format("graft-store").option("path", path).load()
    assert(cur.count() == 201)
    store.append(Seq((99999, "zz")).toDF("n", "v"), 60L)
    assert(cur.count() == 202)
    assert(cur.filter($"n" >= 99999).count() == 1)
  }

  test("timestamp filters render in the SESSION timezone, not the " +
      "JVM default: a pushed row filter keeps the right rows even " +
      "when the two zones disagree") {
    import org.apache.spark.sql.sources.GreaterThan
    val inst = java.time.Instant.parse("2026-01-02T03:04:05.123456Z")
    val defaultTz = java.util.TimeZone.getDefault
    try {
      // a JVM default 8h behind UTC: Timestamp.toString would render
      // '2026-01-01 19:04:05…', which a UTC session re-parses as a
      // DIFFERENT instant — rows between the two instants would be
      // wrongly dropped by the pushed (row-level) filter
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Etc/GMT+8"))
      assert(StoreRelation.predicateSql(
        Array(GreaterThan("ts", java.sql.Timestamp.from(inst))), "UTC")
        == Some("`ts` > TIMESTAMP '2026-01-02 03:04:05.123456'"))
      assert(StoreRelation.predicateSql(
        Array(GreaterThan("ts", inst)), "UTC")
        == Some("`ts` > TIMESTAMP '2026-01-02 03:04:05.123456'"))
      // end-to-end under the skewed default zone: the format read with
      // a timestamp predicate returns exactly the rows a plain read +
      // filter does
      val p = Files.createTempDirectory("reltz-")
      p.toFile.deleteOnExit()
      val store = new ManifestTableStore(p.toString,
        statsColumns = Seq("ts"))
      store.append(
        Seq("2026-01-02 00:00:00", "2026-01-02 06:00:00")
          .toDF("s").selectExpr("CAST(s AS TIMESTAMP) AS ts"), 0L)
      val got = spark.read.format("graft-store")
        .option("path", p.toString).load()
        .filter($"ts" > java.sql.Timestamp.from(inst))
      assert(got.count() == 1,
        "only the 06:00 UTC row is after 03:04:05 UTC")
    } finally java.util.TimeZone.setDefault(defaultTz)
  }
}
