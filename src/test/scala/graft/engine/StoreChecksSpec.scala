package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions.lit

import graft.SparkSpec

/** CHECK constraints at the commit layer (Delta ADD CONSTRAINT):
  * enforced at the single write choke point all paths share — a
  * violating batch never becomes table state.
  */
class StoreChecksSpec extends SparkSpec {

  import spark.implicits._

  private def mkStore(): ManifestTableStore = {
    val p = Files.createTempDirectory("checks-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    store.append(Seq(("a", 1), ("b", 2)).toDF("k", "n"), 0L)
    store
  }

  test("a violating APPEND is refused atomically: no commit, no " +
      "orphan state visible; conforming appends proceed") {
    val store = mkStore()
    store.addCheck(spark, "positive", "n > 0")
    val v = store.currentVersion(spark)
    intercept[IllegalArgumentException] {
      store.append(Seq(("bad", -1)).toDF("k", "n"), 1L)
    }
    assert(store.currentVersion(spark) == v)
    assert(store.read(spark).count() == 2)
    store.append(Seq(("c", 3)).toDF("k", "n"), 1L)
    assert(store.read(spark).count() == 3)
  }

  test("enforcement covers the OTHER write paths: merge inserts, " +
      "UPDATE rewrites, and INSERT OVERWRITE") {
    val store = mkStore()
    store.addCheck(spark, "positive", "n > 0")
    intercept[IllegalArgumentException] {
      store.merge(spark, Seq(("z", -5)).toDF("k", "n"), "k", 2L)
    }
    intercept[IllegalArgumentException] {
      store.update(spark, "k = 'a'", Map("n" -> lit(-7)))
    }
    intercept[IllegalArgumentException] {
      store.overwrite(Seq(("w", -9)).toDF("k", "n"), 3L)
    }
    assert(store.read(spark).select("k", "n").as[(String, Int)]
      .collect().toSet == Set(("a", 1), ("b", 2)),
      "every refused write must leave the table untouched")
    // SQL DML routes hit the same gate
    intercept[IllegalArgumentException] {
      StoreSql.exec(spark, Map("t" -> store),
        "INSERT INTO t SELECT 'q' AS k, -1 AS n", batchId = Some(4L))
    }
  }

  test("addCheck validates EXISTING rows (a constraint the data " +
      "violates is refused); same-predicate re-add is idempotent; " +
      "changing needs dropCheck; drop stops enforcement") {
    val store = mkStore()
    intercept[IllegalArgumentException] {
      store.addCheck(spark, "gt1", "n > 1") // row ("a",1) violates
    }
    store.addCheck(spark, "positive", "n > 0")
    store.addCheck(spark, "positive", "n > 0") // idempotent
    intercept[IllegalArgumentException] {
      store.addCheck(spark, "positive", "n > 10") // changed predicate
    }
    assert(store.listChecks(spark) == Seq("positive" -> "n > 0"))
    store.dropCheck(spark, "positive")
    store.append(Seq(("neg", -1)).toDF("k", "n"), 5L) // now allowed
    assert(store.read(spark).count() == 3)
    intercept[IllegalArgumentException] {
      store.dropCheck(spark, "positive") // already gone
    }
  }

  test("a branch write enforces the table's checks too (constraints " +
      "are table-wide, not per-ref)") {
    val store = mkStore()
    store.addCheck(spark, "positive", "n > 0")
    store.createBranch(spark, "wip", 1L)
    intercept[IllegalArgumentException] {
      store.branch("wip").append(Seq(("x", -2)).toDF("k", "n"), 9L)
    }
    store.branch("wip").append(Seq(("x", 2)).toDF("k", "n"), 9L)
    assert(store.branch("wip").read(spark).count() == 3)
  }
}
