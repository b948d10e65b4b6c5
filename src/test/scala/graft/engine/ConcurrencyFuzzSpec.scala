package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** Multi-writer fuzz over the optimistic commit protocol: several
  * writer PROCESSES (modeled as separate store instances — the
  * instance monitor serializes nothing across them) append disjoint
  * batch ids while maintenance compacts underneath. The invariants the
  * protocol promises: every batch commits exactly once, no append is
  * lost to a rebase, no row is duplicated by a fold, and the final
  * version chain is strictly increasing and complete.
  */
class ConcurrencyFuzzSpec extends SparkSpec {

  import spark.implicits._

  test("8 concurrent writers + interleaved compaction: every batch " +
      "lands exactly once, nothing lost, nothing doubled") {
    val p = Files.createTempDirectory("fuzz-")
    p.toFile.deleteOnExit()
    val nWriters = 8
    val perWriter = 4
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until nWriters).map { w =>
      new Thread(() => {
        try {
          // one store INSTANCE per writer = per-process monitor
          val mine = new ManifestTableStore(p.toString,
            statsColumns = Seq("n"))
          (0 until perWriter).foreach { b =>
            val id = w * 100L + b
            mine.append(Seq((s"w$w-b$b", w * 1000 + b, id))
              .toDF("k", "n", "expect_id"), id)
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    val maintenance = new Thread(() => {
      try {
        val mine = new ManifestTableStore(p.toString,
          statsColumns = Seq("n"))
        (0 until 6).foreach { _ =>
          Thread.sleep(50)
          mine.compactSmall(spark, 1L << 30) // everything is "small"
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    (writers :+ maintenance).foreach(_.start())
    (writers :+ maintenance).foreach(_.join(300000))
    assert(errors.isEmpty, s"unexpected failures: ${errors}")
    val store = new ManifestTableStore(p.toString,
      statsColumns = Seq("n"))
    val rows = store.read(spark)
      .select("k", "batch_id").as[(String, Long)].collect()
    // exactly once: every (writer, batch) key exactly one row,
    // committed under its own id
    assert(rows.length == nWriters * perWriter,
      s"expected ${nWriters * perWriter} rows, got ${rows.length}")
    assert(rows.map(_._1).distinct.length == rows.length,
      "a rebase or fold duplicated a batch")
    val expectedIds =
      (for (w <- 0 until nWriters; b <- 0 until perWriter)
        yield w * 100L + b).toSet
    assert(rows.map(_._2).toSet == expectedIds,
      "batch-id attribution must survive compaction")
    // replay of any id is refused post-hoc
    store.append(Seq(("ghost", -1, 0L)).toDF("k", "n", "expect_id"), 0L)
    assert(store.read(spark).count() == nWriters * perWriter)
    // the manifest chain is complete: every version file readable
    val f = new org.apache.hadoop.fs.Path(p.toString).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val versions = f.listStatus(
      new org.apache.hadoop.fs.Path(s"$p/manifest"))
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .map(_.drop(1).toLong).sorted
    assert(versions.nonEmpty && versions.last >= versions.length,
      "version numbers strictly increase")
    assert(store.history(spark).count() == versions.length,
      "every published version must be complete (end-marker present)")
  }
}
