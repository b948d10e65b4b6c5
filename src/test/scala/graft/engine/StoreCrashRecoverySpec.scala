package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-atomicity contract of the manifest store: a writer can die in
  * the window between writing data/delete files and publishing the
  * manifest version that references them, and the table must behave as
  * if the write never started — readers never see the orphan bytes,
  * vacuum reclaims them, and a clean retry applies. Crashes are
  * injected at the exact failpoint (`beforeDmlCommit`, between file
  * write and first commit attempt) or reproduced as the byte-identical
  * on-disk state a dead appender leaves (a data dir with no manifest
  * entry) — the same windows a kill -9 hits.
  */
class StoreCrashRecoverySpec extends SparkSpec {

  import spark.implicits._

  private final class SimulatedCrash extends RuntimeException("crash")

  private def freshStore(morKey: Option[String] = None)
      : (String, ManifestTableStore) = {
    val p = Files.createTempDirectory("storecrash-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"), morDeleteKey = morKey)
    store.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"), 0L)
    store.append(Seq(("c", 3), ("d", 4)).toDF("k", "n"), 1L)
    (p.toString, store)
  }

  private def dataDirs(path: String): Set[String] = {
    val d = new java.io.File(path, "data")
    if (!d.exists()) Set.empty else d.listFiles().map(_.getName).toSet
  }

  private def state(store: ManifestTableStore): Set[(String, Int)] =
    store.read(spark).select("k", "n").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet

  test("appender dies between data write and manifest commit: readers " +
      "never see the orphan dir and vacuum reclaims it") {
    val (path, store) = freshStore()
    val v = store.currentVersion(spark)
    // the on-disk state of append(df, 9L) killed before tryCommit:
    // a fully-written data dir, zero manifest references
    Seq(("x", 99)).toDF("k", "n").withColumn("batch_id", lit(9L))
      .write.parquet(s"$path/data/batch-9-deadwriter")
    assert(store.currentVersion(spark) == v)
    assert(state(store) == Set(("a", 1), ("b", 2), ("c", 3), ("d", 4)))
    assert(store.read(spark).inputFiles.forall(!_.contains("deadwriter")))
    Thread.sleep(50)
    val reclaimed = store.vacuum(spark, retainLast = 10, minAgeMs = 0L)
    assert(reclaimed.exists(_.contains("batch-9-deadwriter")),
      s"vacuum did not reclaim the orphan: $reclaimed")
    assert(!dataDirs(path).contains("batch-9-deadwriter"))
    // the live dirs survived the vacuum
    assert(state(store) == Set(("a", 1), ("b", 2), ("c", 3), ("d", 4)))
  }

  test("CoW delete dies between rewrite write and commit: no state " +
      "change, orphan rewrite dirs reclaimed, clean retry applies") {
    val (path, store) = freshStore()
    val before = state(store)
    val dirsBefore = dataDirs(path)
    store.beforeDmlCommit = () => {
      store.beforeDmlCommit = () => ()
      throw new SimulatedCrash
    }
    intercept[SimulatedCrash] { store.delete(spark, "n >= 3") }
    // nothing committed: same version chain, same visible rows
    assert(state(store) == before)
    // the crash left orphan rewrite dirs (delete-*) on disk...
    val orphans = dataDirs(path) -- dirsBefore
    assert(orphans.nonEmpty && orphans.forall(_.startsWith("delete-")))
    Thread.sleep(50)
    // ...which vacuum reclaims without touching live dirs
    val reclaimed = store.vacuum(spark, retainLast = 10, minAgeMs = 0L)
    assert(orphans.forall(o => reclaimed.exists(_.contains(o))),
      s"vacuum missed orphans $orphans, got $reclaimed")
    assert(state(store) == before)
    // clean retry: the delete applies exactly once
    store.delete(spark, "n >= 3")
    assert(state(store) == Set(("a", 1), ("b", 2)))
  }

  test("MoR delete dies between delete-file write and commit: keys " +
      "stay visible, orphan delete file reclaimed, retry applies") {
    val (path, store) = freshStore(morKey = Some("k"))
    val before = state(store)
    store.beforeDmlCommit = () => {
      store.beforeDmlCommit = () => ()
      throw new SimulatedCrash
    }
    intercept[SimulatedCrash] { store.deleteMoR(spark, "n >= 3", "k") }
    // the uncommitted delete file must not mask any row
    assert(state(store) == before)
    val delRoot = new java.io.File(path, "deletes")
    assert(delRoot.exists() && delRoot.listFiles().nonEmpty)
    Thread.sleep(50)
    val reclaimed = store.vacuum(spark, retainLast = 10, minAgeMs = 0L)
    assert(reclaimed.exists(_.contains("/deletes/")),
      s"vacuum did not reclaim the orphan delete file: $reclaimed")
    assert(delRoot.listFiles() == null || delRoot.listFiles().isEmpty)
    // retry commits a fresh delete file; merge-on-read state applies it
    store.deleteMoR(spark, "n >= 3", "k")
    assert(state(store) == Set(("a", 1), ("b", 2)))
  }
}
