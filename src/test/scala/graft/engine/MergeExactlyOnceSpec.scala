package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Round-10 exactly-once hardening of the general-merge surface.
  *
  * The replay contract ("a replayed batchId is a no-op, exactly like
  * append") only holds if EVERY mergeClauses commit carries an entry
  * under the new batch id. An update/delete-only merge rewrites dirs
  * under their OLD ids, so without the unconditional zero-row insert
  * marker the replay check could never fire and a crashed-and-replayed
  * CDC micro-batch would re-apply: non-idempotent SETs double-apply,
  * and a MATCHED-DELETE + NOT-MATCHED-INSERT batch whose keys all
  * matched first time resurrects the deleted rows as inserts. These
  * tests pin the marker semantics end-to-end through the SQL router.
  */
class MergeExactlyOnceSpec extends SparkSpec {

  import spark.implicits._
  import ManifestTableStore.{DeleteClause, InsertClause, UpdateClause}

  private def freshStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("mergeonce-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    store.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "n"), 0L)
    store
  }

  private def state(store: ManifestTableStore): Set[(String, Int)] =
    store.read(spark).select("k", "n").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet

  test("an update-only MERGE with a non-idempotent SET applies " +
      "exactly once: the replayed batch id is a no-op") {
    val store = freshStore()
    val src = Seq(("a", 10), ("b", 20)).toDF("k", "delta")
    def applyOnce(): Unit = store.mergeClauses(spark, src, "k",
      matched = Seq(UpdateClause(None,
        Some(Seq("n" -> "n + __src_delta")))),
      notMatched = Nil, bySource = Nil, batchId = 7L)
    applyOnce()
    assert(state(store) == Set(("a", 11), ("b", 22), ("c", 3)))
    val v = store.currentVersion(spark)
    applyOnce() // the crashed-writer replay: same id, same statement
    assert(store.currentVersion(spark) == v,
      "replay must not commit a new version")
    assert(state(store) == Set(("a", 11), ("b", 22), ("c", 3)),
      "replay must not double-apply the increment")
  }

  test("a MATCHED-DELETE + NOT-MATCHED-INSERT batch whose keys all " +
      "matched replays as a no-op (no resurrection as inserts)") {
    val store = freshStore()
    val src = Seq(("a", 100), ("b", 200)).toDF("k", "n")
    def applyOnce(): Unit = store.mergeClauses(spark, src, "k",
      matched = Seq(DeleteClause(None)),
      notMatched = Seq(InsertClause(None, None)),
      bySource = Nil, batchId = 9L)
    applyOnce() // all source keys matched → both deleted, none inserted
    assert(state(store) == Set(("c", 3)))
    applyOnce() // on replay a/b no longer match — naive logic inserts
    assert(state(store) == Set(("c", 3)),
      "replay must not resurrect the deleted keys as inserts")
  }

  test("a delete-only merge that touches nothing still commits its " +
      "batch id, so the marker itself is replay-refused") {
    val store = freshStore()
    val src = Seq(("zz", 99)).toDF("k", "n") // matches no target row
    store.mergeClauses(spark, src, "k",
      matched = Seq(DeleteClause(None)), notMatched = Nil,
      bySource = Nil, batchId = 5L)
    assert(state(store) == Set(("a", 1), ("b", 2), ("c", 3)))
    // the commit happened (marker entry), so a later real batch under
    // the same id is correctly refused as a replay
    store.mergeClauses(spark, Seq(("a", 1)).toDF("k", "n"), "k",
      matched = Seq(DeleteClause(None)), notMatched = Nil,
      bySource = Nil, batchId = 5L)
    assert(state(store) == Set(("a", 1), ("b", 2), ("c", 3)))
  }

  test("the merge source is pinned before evaluation: a " +
      "non-deterministic source applies one consistent row set") {
    val store = freshStore()
    // rand() re-evaluates per action without pinning; with the pin the
    // same sampled subset drives the update, the anti-join, and the
    // insert write, so invariants hold regardless of the draw
    val src = spark.range(0, 26)
      .selectExpr("char(97 + id) AS k", "cast(id as int) AS n")
      .where(org.apache.spark.sql.functions.rand() < 0.5)
    store.mergeClauses(spark, src, "k",
      matched = Seq(UpdateClause(None, Some(Seq("n" -> "1000")))),
      notMatched = Seq(InsertClause(None, None)),
      bySource = Nil, batchId = 3L)
    val rows = state(store)
    val updatedOrKept = rows.filter { case (k, _) => k <= "c" }
    // every surviving a/b/c row is either untouched (source missed it)
    // or exactly 1000 (source hit it) — never a half-applied mix, and
    // inserted keys are exactly the source draw minus a/b/c
    assert(updatedOrKept.forall { case (k, n) =>
      n == 1000 || Map("a" -> 1, "b" -> 2, "c" -> 3)(k) == n })
    assert(rows.map(_._1).count(_ > "c") ==
      rows.count { case (k, n) => k > "c" && n >= 3 && n < 26 })
  }

  test("general MERGE through SQL seeds an EMPTY table (insert-only " +
      "path no longer breaks on qualifier resolution)") {
    val p = Files.createTempDirectory("mergeseed-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString)
    Seq(("x", 1), ("y", 2)).toDF("k", "n")
      .createOrReplaceTempView("seed_src")
    StoreSql.exec(spark, Map("t" -> store),
      """MERGE INTO t USING seed_src ON t.k = seed_src.k
        |WHEN MATCHED AND t.n < 0 THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      batchId = Some(0L))
    assert(state(store) == Set(("x", 1), ("y", 2)))
  }

  test("DELETE full-table guard reads the parsed condition: a WHERE " +
      "hidden in a comment does not satisfy it, a real predicate " +
      "needs no text check") {
    val store = freshStore()
    val v = store.currentVersion(spark)
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "DELETE FROM t /* where */")
    }
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "DELETE FROM t -- where\n")
    }
    assert(store.currentVersion(spark) == v,
      "guarded statements must not mutate the table")
    // a real parsed predicate passes with no reliance on text shape
    StoreSql.exec(spark, Map("t" -> store),
      "DELETE FROM t WHERE k = 'a'")
    assert(state(store) == Set(("b", 2), ("c", 3)))
    // and the explicit spelled-out form still works
    StoreSql.exec(spark, Map("t" -> store), "DELETE FROM t WHERE true")
    assert(store.read(spark).isEmpty)
  }

  test("writerBase resolves the MINIMUM slot when a race double-" +
      "claimed a writer id — stable across restarts on any listing " +
      "order") {
    val p = Files.createTempDirectory("writermin-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString)
    val base1 = store.writerBase(spark, "w1")
    assert(base1 == (1L << 40))
    // simulate the lost race: a second slot file claims the same name
    val fs = new org.apache.hadoop.fs.Path(p.toString).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    AtomicCreate.publish(fs,
      new org.apache.hadoop.fs.Path(s"$p/writers/slot-2"),
      "w1".getBytes("UTF-8"))
    // resolution is deterministic: still the minimum slot
    assert(store.writerBase(spark, "w1") == (1L << 40))
    // a NEW writer allocates past both slots, never colliding
    val base3 = store.writerBase(spark, "w2")
    assert(base3 > (2L << 40) - 1 && base3 % (1L << 40) == 0)
    assert(store.writerBase(spark, "w2") == base3)
  }
}
