package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Clone-aware source VACUUM: a shallow clone's manifest references the
  * SOURCE's data dirs — the source's vacuum must refuse to delete
  * history an un-severed clone still serves (closing the footgun Delta
  * documents as a caveat), self-heal severed/dropped refs, and honor
  * the explicit override.
  */
class CloneVacuumSpec extends SparkSpec {

  import spark.implicits._

  private def freshCat(): (StoreCatalog, String) = {
    val p = Files.createTempDirectory("clone-vacuum-")
    p.toFile.deleteOnExit()
    (new StoreCatalog(p.toString), p.toString)
  }

  private def superseded(cat: StoreCatalog, table: String): Unit = {
    // a CoW delete rewrites the dir, leaving the original superseded —
    // the thing an aggressive vacuum would reclaim
    cat.exec(spark, s"DELETE FROM $table WHERE n = 1")
  }

  test("source VACUUM refuses while a live clone serves its dirs, the " +
      "override conf proceeds, and a SEVERED clone (compact) self-heals " +
      "the ref so vacuum runs clean") {
    val (cat, base) = freshCat()
    cat.exec(spark, "CREATE TABLE vs (n INT) USING graft_store")
    cat.exec(spark, "INSERT INTO vs VALUES (1), (2)", batchId = Some(0L))
    cat.exec(spark, "CREATE TABLE vc SHALLOW CLONE vs")
    superseded(cat, "vs")
    val e = intercept[IllegalStateException] {
      cat.store("vs").vacuum(spark, retainLast = 0, minAgeMs = 0L)
    }
    assert(e.getMessage.contains("vc") ||
      e.getMessage.contains("clone"), e.getMessage)
    // the SQL verb hits the same guard (retention check disabled so
    // the statement reaches the clone guard, not the 168 h floor)
    spark.conf.set("spark.graft.vacuum.retentionCheck.enabled", "false")
    try intercept[IllegalStateException] {
      cat.exec(spark, "VACUUM vs RETAIN 0 HOURS")
    } finally spark.conf
      .unset("spark.graft.vacuum.retentionCheck.enabled")
    // the clone still reads every row it was born with
    assert(cat.query(spark, "SELECT n FROM vc ORDER BY n").as[Int]
      .collect().toSeq == Seq(1, 2))
    // sever step 1: compact() materializes the clone's CURRENT state
    // under its own root — but the clone's v1 manifest still serves
    // source dirs (time travel there would break), so the source
    // vacuum STILL refuses
    cat.store("vc").compact(spark)
    intercept[IllegalStateException] {
      cat.store("vs").vacuum(spark, retainLast = 0, minAgeMs = 0L)
    }
    // sever step 2: the clone's own vacuum retires the source-serving
    // versions; now the ref self-heals and the source vacuum proceeds
    cat.store("vc").vacuum(spark, retainLast = 0, minAgeMs = 0L)
    val deleted = cat.store("vs")
      .vacuum(spark, retainLast = 0, minAgeMs = 0L)
    assert(deleted.nonEmpty, "expected the superseded dir reclaimed")
    val f = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val refs = new org.apache.hadoop.fs.Path(s"$base/vs/clone_refs")
    assert(!f.exists(refs) || f.listStatus(refs).isEmpty,
      "severed ref must self-heal away")
    // both tables intact after the reclaim
    assert(cat.query(spark, "SELECT n FROM vs").as[Int]
      .collect().toSeq == Seq(2))
    assert(cat.query(spark, "SELECT n FROM vc ORDER BY n").as[Int]
      .collect().toSeq == Seq(1, 2))
  }

  test("the override conf accepts the documented caveat; DRY RUN stays " +
      "read-only (no refusal, no self-heal); a DROPPED clone's ref " +
      "self-heals") {
    val (cat, base) = freshCat()
    cat.exec(spark, "CREATE TABLE os (n INT) USING graft_store")
    cat.exec(spark, "INSERT INTO os VALUES (1), (2)", batchId = Some(0L))
    cat.exec(spark, "CREATE TABLE oc SHALLOW CLONE os")
    superseded(cat, "os")
    // DRY RUN reports without refusing — and leaves the ref in place
    val wouldDelete = cat.store("os")
      .vacuum(spark, retainLast = 0, minAgeMs = 0L, dryRun = true)
    assert(wouldDelete.nonEmpty)
    val f = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val refs = new org.apache.hadoop.fs.Path(s"$base/os/clone_refs")
    assert(f.listStatus(refs).nonEmpty)
    // override: explicit acceptance of breaking the clone
    val key = ManifestTableStore.VacuumIgnoreClonesConf
    spark.conf.set(key, "true")
    try {
      val deleted = cat.store("os")
        .vacuum(spark, retainLast = 0, minAgeMs = 0L)
      assert(deleted.nonEmpty)
    } finally spark.conf.unset(key)
    // oc remains un-severed — drop it so only the next ref matters
    cat.exec(spark, "DROP TABLE oc")
    // a fresh clone whose directory is then DROPPED: ref self-heals
    cat.exec(spark, "INSERT INTO os VALUES (5)", batchId = Some(1L))
    cat.exec(spark, "CREATE TABLE oc2 SHALLOW CLONE os")
    cat.exec(spark, "DROP TABLE oc2")
    superseded(cat, "os") // n=1 already gone; delete something present
    cat.exec(spark, "DELETE FROM os WHERE n = 2")
    val deleted2 = cat.store("os")
      .vacuum(spark, retainLast = 0, minAgeMs = 0L)
    assert(deleted2.nonEmpty)
    assert(!f.exists(refs) || f.listStatus(refs).isEmpty)
  }
}
