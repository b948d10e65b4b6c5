package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Targeted merge-on-read delete folding ([[ManifestTableStore
  * .compactDeletes]]): rewrite scope bounded by sequence scope AND key
  * stats, delete entries dropped in one commit, untouched dirs
  * physically carried — and the fast-forward guards that keep folds
  * from resurrecting deletions across refs.
  */
class CompactDeletesSpec extends SparkSpec {

  import spark.implicits._

  private def mkStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("delfold-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("k"), morDeleteKey = Some("k"))
    // two key-disjoint dirs: a purge in one range must not touch the other
    store.append((1 to 50).map(k => (k.toLong, s"v$k"))
      .toDF("k", "v"), 0L)
    store.append((100 to 150).map(k => (k.toLong, s"v$k"))
      .toDF("k", "v"), 1L)
    store
  }

  private def dirsOf(store: ManifestTableStore): Set[String] =
    store.read(spark).inputFiles
      .map(_.split("/data/").last.split('/').head).toSet

  test("the fold rewrites ONLY dirs whose key stats admit a delete " +
      "key; delete entries drop; content and metadata count recover") {
    val store = mkStore()
    store.deleteMoR(spark, "k IN (5, 7)", "k")
    assert(store.countRows(spark).isEmpty, // pending deletes block it
      "metadata count must decline while delete files are pending")
    val before = store.read(spark).select("k").as[Long].collect().toSet
    val dir1 = dirsOf(store).filter(_ => true)
    val untouchedBefore = store.read(spark).inputFiles
      .filter(_.contains("batch-1")).toSet
    store.compactDeletes(spark)
    assert(store.read(spark).select("k").as[Long].collect().toSet
      == before, "fold must be content-neutral vs the MoR state")
    assert(store.countRows(spark) == Some(99L),
      "metadata count recovers exactly after the fold")
    val untouchedAfter = store.read(spark).inputFiles
      .filter(_.contains("batch-1")).toSet
    assert(untouchedBefore == untouchedAfter,
      "the key-disjoint dir must carry forward byte-identical")
    assert(dirsOf(store).exists(_.startsWith("delfold-")))
    // idempotent: nothing pending -> no-op
    val v = store.currentVersion(spark)
    store.compactDeletes(spark)
    assert(store.currentVersion(spark) == v)
  }

  test("multiple pending delete files fold in one commit and compose") {
    val store = mkStore()
    store.deleteMoR(spark, "k <= 3", "k")
    store.deleteMoR(spark, "k >= 148", "k")
    val before = store.read(spark).select("k").as[Long].collect().toSet
    val v = store.currentVersion(spark)
    store.compactDeletes(spark)
    assert(store.currentVersion(spark) == v + 1)
    assert(store.read(spark).select("k").as[Long].collect().toSet
      == before)
    assert(store.countRows(spark) == Some(95L))
  }

  test("rows appended AFTER a delete survive its fold (sequence " +
      "scope respected in the targeted rewrite)") {
    val store = mkStore()
    store.deleteMoR(spark, "k = 10", "k")
    store.append(Seq((10L, "reborn")).toDF("k", "v"), 2L)
    store.compactDeletes(spark)
    val vs = store.read(spark).filter("k = 10").select("v")
      .as[String].collect().toSet
    assert(vs == Set("reborn"))
  }

  test("maintain() runs exactly the needed steps: fold when deletes " +
      "pend, small-file merge when crumbs exist, nothing when clean") {
    val store = mkStore()
    store.deleteMoR(spark, "k = 5", "k")
    // both dirs are tiny, so the small-file pass merges them too
    assert(store.maintain(spark) ==
      Seq("compactDeletes", "compactSmall"))
    assert(store.read(spark).count() == 100)
    assert(store.maintain(spark) == Nil,
      "a clean table's maintenance is two manifest reads")
    val v = store.currentVersion(spark)
    assert(store.currentVersion(spark) == v)
  }

  test("fast-forward refuses over a FOLDED deletion on main — both " +
      "the targeted fold (delfold- dirs) and whole-table compact " +
      "(row-count guard): publishing would resurrect deleted rows") {
    // targeted fold
    val s1 = mkStore()
    s1.createBranch(spark, "b1", 2L)
    s1.branch("b1").append(Seq((999L, "x")).toDF("k", "v"), 7L)
    s1.deleteMoR(spark, "k = 5", "k")
    s1.compactDeletes(spark)
    intercept[IllegalArgumentException] {
      s1.fastForward(spark, "b1")
    }
    // whole-table compact fold: dirs are compact- named and ids carry,
    // so only the manifest row-count comparison can catch it
    val s2 = mkStore()
    s2.createBranch(spark, "b2", 2L)
    s2.branch("b2").append(Seq((999L, "x")).toDF("k", "v"), 7L)
    s2.deleteMoR(spark, "k = 5", "k")
    s2.compact(spark)
    intercept[IllegalArgumentException] {
      s2.fastForward(spark, "b2")
    }
    assert(!s2.read(spark).select("k").as[Long].collect().contains(5L))
  }
}
