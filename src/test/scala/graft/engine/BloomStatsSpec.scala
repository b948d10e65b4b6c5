package graft.engine

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-dir bloom membership stats: (1) the driver-side probe hash is
  * bit-identical to the build-side Spark expression — the parity that
  * makes pruning sound; (2) an equality lookup on a high-cardinality key
  * prunes every dir that provably lacks the key, where min/max ranges
  * (fully overlapping by construction here) prune nothing; (3) results
  * remain EXACTLY read().filter(...); (4) DML rewrites recompute the
  * bitsets for rewritten dirs.
  */
class BloomStatsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  /** Four batches whose long keys INTERLEAVE (k % 4 == batch) so every
    * dir's min/max range spans the whole key space — range stats can
    * never prune an equality probe, only the bloom can.
    */
  private def seeded(root: Path): ManifestTableStore = {
    val store = new ManifestTableStore(root.toString,
      statsColumns = Seq("k"), bloomColumns = Seq("k", "v"),
      bloomBits = 1 << 12)
    (0 until 4).foreach { b =>
      store.append((0 until 400).filter(_ % 4 == b)
        .map(i => (i.toLong, s"w$i")).toDF("k", "v"), b.toLong)
    }
    store
  }

  test("driver-side probe positions equal the build-side Spark " +
      "expression's, for integral and string forms") {
    val m = 1 << 12
    val samples = Seq("7", "w93", "", "über", "-42", "10737418240")
    val fromSpark = spark.createDataset(samples).toDF("s")
      .selectExpr(s"transform(sequence(0, " +
        s"${ManifestTableStore.BloomK - 1}), " +
        s"i -> pmod(xxhash64(i, s), cast($m as bigint))) as ps")
      .collect().map(_.getSeq[Long](0).map(_.toInt).toSeq)
    val fromDriver =
      samples.map(ManifestTableStore.bloomPositions(_, m).toSeq)
    assert(fromSpark.toSeq == fromDriver)
  }

  test("equality lookup prunes all dirs but the key's own; result is " +
      "exactly read().filter") {
    val store = seeded(tmp("bloom-store"))
    // key 93: 93 % 4 == 1 → only batch-1's dir may hold it
    val files = store.readWhere(spark, "k = 93").inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/batch-1-")),
      s"bloom failed to prune:\n${files.mkString("\n")}")
    assert(store.readWhere(spark, "k = 93").select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((93L, "w93")))
    // string-column probe prunes the same way
    val sf = store.readWhere(spark, "v = 'w94'").inputFiles
    assert(sf.nonEmpty && sf.forall(_.contains("/batch-2-")),
      s"string bloom failed to prune:\n${sf.mkString("\n")}")
    // a key no dir holds: every dir pruned, zero rows
    assert(store.readWhere(spark, "k = 100000").count() == 0L)
    // non-canonical literal forms keep dirs (conservative), never wrong
    assert(store.readWhere(spark, "k = 93.5").count() == 0L)
    assert(store.readWhere(spark, "k = 93.0").select("v")
      .as[String].collect().toSeq == Seq("w93"))
  }

  test("IN-list pruning opens only the dirs holding requested members; " +
      "absent members prune everywhere") {
    val store = seeded(tmp("bloom-in"))
    // 93 % 4 == 1, 94 % 4 == 2; 100000 lives nowhere → dirs 0 and 3
    // are provably free of every member and must be pruned
    val df = store.readWhere(spark, "k IN (93, 94, 100000)")
    val files = df.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f =>
        f.contains("/batch-1-") || f.contains("/batch-2-")),
      s"IN-list pruning leaked dirs:\n${files.mkString("\n")}")
    assert(df.select("k").as[Long].collect().sorted.toSeq ==
      Seq(93L, 94L))
    // all members absent → zero dirs, zero rows
    assert(store.readWhere(spark, "k IN (100001, 100002)").count() == 0L)
    // same-column OR of equalities prunes like the equivalent IN
    val of = store.readWhere(spark, "k = 93 OR k = 94").inputFiles
    assert(of.nonEmpty && of.forall(f =>
        f.contains("/batch-1-") || f.contains("/batch-2-")),
      s"OR-of-equalities failed to prune:\n${of.mkString("\n")}")
    // an OR the normalizer can't lift (mixed columns) prunes nothing
    // but stays correct
    assert(store.readWhere(spark, "k = 93 OR v = 'w94'")
      .select("k").as[Long].collect().sorted.toSeq == Seq(93L, 94L))
  }

  test("countRows answers COUNT(*) from manifest metadata and tracks " +
      "appends and DML") {
    val store = seeded(tmp("bloom-count"))
    assert(store.countRows(spark).contains(400L))
    assert(store.read(spark).count() == 400L)
    store.delete(spark, "k = 93")
    assert(store.countRows(spark).contains(399L))
  }

  test("DML rewrite recomputes the rewritten dir's bloom; untouched " +
      "dirs keep pruning") {
    val store = seeded(tmp("bloom-dml"))
    store.delete(spark, "k = 93")
    // 93 is gone from the data AND from batch-1's rewritten bitset:
    // the lookup now prunes every dir (93's bits were only ever real in
    // dir 1, whose rewrite no longer contains them modulo fp)
    assert(store.readWhere(spark, "k = 93").count() == 0L)
    val (kept, skipped) = store.pruneDirs(spark, "k = 93")
    assert(kept.isEmpty,
      s"rewritten dir still claims the deleted key: $kept")
    assert(skipped.size == 4)
    // sibling keys in the rewritten dir still resolve
    assert(store.readWhere(spark, "k = 97").select("v")
      .as[String].collect().toSeq == Seq("w97"))
  }
}
