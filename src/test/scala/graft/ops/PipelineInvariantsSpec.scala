package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Tables

/** End-to-end invariants of the composed training pipeline (q67). Each
  * stage is pinned by its own oracle/audit; these assertions pin the
  * COMPOSITION — the properties a downstream training run relies on.
  */
class PipelineInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, dir, "documents")
  private lazy val kept = DedupOps.trainingKeepList(docs, minQuality = 0.2)

  test("kept ids are a subset of the corpus, with no exact-dup text " +
      "among them") {
    val keptDocs = kept.join(docs, "doc_id")
    assert(keptDocs.count() == kept.count(), "kept id not in corpus")
    assert(keptDocs.select("text").distinct().count() == kept.count(),
      "two kept docs share identical text")
  }

  test("near-dup clusters contribute exactly one representative") {
    // every kept pair that LSH would flag as >= 0.9-similar must not
    // exist: high-certainty near-dups were collapsed
    val sigs = DedupOps.minhashSigs(
      kept.join(docs, "doc_id").select("doc_id", "text"))
    val residual = DedupOps.minhashLshCandidates(sigs, 16, 4)
      .filter(col("est_jaccard") >= 0.9)
    assert(residual.isEmpty,
      s"near-dup pair survived: ${residual.take(3).toSeq}")
  }

  test("split assignment is exhaustive, deterministic, and accounts for " +
      "every source document once") {
    val splits = kept.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // multiplicity conservation: each source doc is either dropped by the
    // quality floor or counted in exactly one keeper's n_exact
    val words = "split(text, ' ')"
    val quality = expr(s"least(1.0, size($words) / 100.0) * (1.0 - " +
      s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
      s" / size($words))")
    // conservation, computed independently of trainingKeepList's
    // internals: exact classes partition the quality-filtered corpus, so
    // class multiplicities must sum to the quality-doc count ...
    val qualityDocs = docs.filter(quality >= 0.2)
    val classes = qualityDocs.groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_exact"))
    assert(classes.agg(sum("n_exact")).head().getLong(0)
      == qualityDocs.count())
    // ... keepers are class representatives carrying their class's exact
    // multiplicity verbatim ...
    val mismatched = kept
      .join(classes.select("doc_id", "n_exact").toDF("doc_id", "class_n"),
        "doc_id", "left")
      .filter(col("class_n").isNull || col("class_n") =!= col("n_exact"))
    assert(mismatched.isEmpty,
      s"keeper not a class rep or multiplicity drifted: " +
        s"${mismatched.take(3).toSeq}")
    // ... and near-dup resolution only ever DROPS whole classes
    val nAccounted = kept.agg(sum("n_exact")).head().getLong(0)
    assert(nAccounted <= qualityDocs.count())
    assert(kept.count() <= classes.count())
    // deterministic: second evaluation is identical
    val again = DedupOps.trainingKeepList(docs, 0.2)
      .orderBy("doc_id").collect().toSeq
    assert(kept.orderBy("doc_id").collect().toSeq == again)
  }

  test("artifact-backed build (registered q67) is row-identical to the " +
      "from-scratch pipeline") {
    // the q44 candidate artifact restricted to quality-surviving reps
    // must yield the same keep-list as re-running signature+banding on
    // the filtered corpus — the restriction argument trainingKeepList-
    // Indexed's scaladoc makes, asserted
    val indexed = DedupOps.trainingKeepListIndexed(spark, dir, 0.2)
      .orderBy("doc_id").collect().toSeq
    assert(kept.orderBy("doc_id").collect().toSeq == indexed)
  }

  test("maintained band index (q135): state == from-scratch build, " +
      "appends idempotent, no text indexed twice") {
    val store = DedupOps.maintainedBandIndex(spark, dir)
    val versionAfter = store.currentVersion(spark)
    val state = store.read(spark).select("doc_id", "band", "bh")
    // from-scratch twin under the same ingest-order rep rule: corpus
    // slice reps + delta slice reps whose text is not already indexed
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val reps = corpus.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .unionByName(docs.filter(col("doc_id") % 10 === 9)
        .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
        .join(corpus.select("text"), Seq("text"), "left_anti"))
    val scratch = DedupOps.bandBuckets(
        DedupOps.minhashSigs(reps.select("doc_id", "text")), 16, 4)
      .select("doc_id", "band", "bh")
    assert(state.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(state).isEmpty,
      "maintained index state differs from the from-scratch build")
    // idempotency: replaying the maintenance run appends nothing
    val again = DedupOps.maintainedBandIndex(spark, dir)
    assert(again.currentVersion(spark) == versionAfter,
      "replayed maintenance run committed a new version")
    // no text indexed twice: indexed doc_ids are reps of distinct texts
    val texts = state.select("doc_id").distinct().join(docs, "doc_id")
    assert(texts.select("text").distinct().count() == texts.count(),
      "two indexed docs share identical text")
  }
}
