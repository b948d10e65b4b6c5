package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Named snapshot refs (Iceberg tags) on the manifest store: immutable
  * name→version pins, readable by name, retention-exempt under vacuum
  * until dropped — the reproducibility contract that lets "the corpus
  * the model trained on" outlive cleanup of every untagged version.
  */
class ManifestTagSpec extends SparkSpec {

  import spark.implicits._

  private def newStore(): (String, ManifestTableStore) = {
    val p = Files.createTempDirectory("tags-")
    p.toFile.deleteOnExit()
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    store.append(Seq(("a", 1)).toDF("k", "n"), 0L) // v1
    store.append(Seq(("b", 2)).toDF("k", "n"), 1L) // v2
    store.append(Seq(("c", 3)).toDF("k", "n"), 2L) // v3
    (p.toString, store)
  }

  test("tag / readTag / listTags: a name pins a version; re-tagging the " +
      "same version is a no-op, moving it is refused, unknown names and " +
      "bad versions are refused") {
    val (_, store) = newStore()
    store.tag(spark, "audit-1", 2L)
    assert(store.resolveTag(spark, "audit-1") == 2L)
    assert(store.readTag(spark, "audit-1").select("k").as[String]
      .collect().toSet == Set("a", "b"))
    store.tag(spark, "audit-1", 2L) // idempotent retry
    intercept[IllegalArgumentException] {
      store.tag(spark, "audit-1", 3L) // immutable: no silent move
    }
    intercept[IllegalArgumentException] {
      store.tag(spark, "ghost", 99L) // version must exist and be complete
    }
    intercept[IllegalArgumentException] {
      store.resolveTag(spark, "nope")
    }
    intercept[IllegalArgumentException] {
      store.tag(spark, "bad/name", 2L) // path-unsafe names refused
    }
    store.tag(spark, "latest", 3L)
    assert(store.listTags(spark) == Seq("audit-1" -> 2L, "latest" -> 3L))
  }

  test("shallow clone is zero-copy and independent: reads equal the " +
      "source snapshot, clone writes never touch the source, source " +
      "commits stay invisible to the clone") {
    val (_, store) = newStore()
    val target = Files.createTempDirectory("clone-").toString + "/t"
    val clone = store.shallowClone(spark, target)
    // zero copy: the clone READS the source's physical dirs
    assert(clone.read(spark).select("k").as[String].collect().toSet
      == Set("a", "b", "c"))
    assert(clone.read(spark).inputFiles.forall(!_.contains("/t/")))
    // independent evolution, both directions
    clone.append(Seq(("z", 9)).toDF("k", "n"), 100L)
    clone.delete(spark, "n = 1")
    store.append(Seq(("m", 7)).toDF("k", "n"), 100L)
    assert(clone.read(spark).select("k").as[String].collect().toSet
      == Set("b", "c", "z"))
    assert(store.read(spark).select("k").as[String].collect().toSet
      == Set("a", "b", "c", "m"))
    // a second clone into the same target is refused
    intercept[IllegalArgumentException] {
      store.shallowClone(spark, target)
    }
  }

  test("vacuum retains tagged versions (manifest AND data dirs) past " +
      "the retention horizon; dropping the tag releases them") {
    val (_, store) = newStore()
    store.tag(spark, "pinned", 1L)
    // push v1 far below the horizon: compact (v4) then retain only 1
    store.compact(spark)
    Thread.sleep(50)
    store.vacuum(spark, retainLast = 0, minAgeMs = 0L)
    // v1 survived vacuum because the tag names it...
    assert(store.readTag(spark, "pinned").select("k").as[String]
      .collect().toSet == Set("a"))
    // ...while the untagged v2/v3 manifests are gone
    intercept[Exception] { store.readVersion(spark, 2L) }
    // current state untouched
    assert(store.read(spark).count() == 3)
    // drop the pin: the next vacuum reclaims v1's manifest and its dir
    store.dropTag(spark, "pinned")
    Thread.sleep(50)
    val reclaimed = store.vacuum(spark, retainLast = 0, minAgeMs = 0L)
    assert(reclaimed.exists(_.contains("batch-0-")),
      s"expected v1's data dir reclaimed, got $reclaimed")
    intercept[Exception] { store.readTag(spark, "pinned") }
    assert(store.read(spark).count() == 3)
  }
}
