package graft.ops

import org.apache.spark.sql.functions.{col, expr}

import graft.SparkSpec

/** Semantic laws of the full-BPE tier (q139-q141) that the oracle hash
  * checks can't state: monotone merge counts, lossless token round-trip,
  * and the greedy-apply boundary semantics the double-space encoding
  * exists to guarantee. All inputs are real corpus data; every hash and
  * tie-break is deterministic, so these are stable assertions.
  */
class BpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("learned merge counts are non-increasing in rank, and later merges" +
      " build on earlier outputs (some lhs/rhs is itself a merged token)") {
    val m = TextOps.bpeMerges(spark, dir).orderBy("merge_rank").collect()
    assert(m.length == 12)
    val counts = m.map(_.getAs[Long]("pair_n")).toSeq
    assert(counts == counts.sorted.reverse,
      s"pair_n must be non-increasing in rank: $counts")
    // Merging (l, r) can only create pairs that are sub-occurrences of
    // existing ones, so the max pair count never rises — and a healthy
    // vocabulary learns chains: at least one later rule consumes an
    // earlier rule's output.
    val merged = m.map(_.getAs[String]("merged")).toSet
    assert(m.exists(r => merged.contains(r.getAs[String]("lhs")) ||
      merged.contains(r.getAs[String]("rhs"))),
      "no multi-character merge chain learned — vocabulary too shallow")
  }

  test("encoded vocabulary round-trips: stripping delimiters from enc " +
      "reconstructs every word exactly; 1 <= n_tok <= length(wd)") {
    val v = TextOps.bpeVocab(spark, dir)
    val bad = v.filter(
      expr("replace(trim(enc), '  ', '') <> wd") ||
        col("n_tok") < 1 || col("n_tok") > expr("length(wd)"))
    assert(bad.isEmpty, s"round-trip violations: ${bad.head(5).toSeq}")
    // Merges actually fired: the corpus compresses below 1 token/char.
    val stats = v.selectExpr("sum(freq * n_tok) AS toks",
      "sum(freq * length(wd)) AS chars").head()
    assert(stats.getLong(0) < stats.getLong(1),
      "no compression — merges never applied")
  }

  test("greedy apply merges adjacent repeats: rule (l, r) applied to " +
      "'lrlr' yields two merged tokens (the single-space encoding bug)") {
    // The law the double-space delimiter scheme exists for: consecutive
    // matches share a boundary, so replace() merges BOTH occurrences.
    import spark.implicits._
    val m = TextOps.bpeMerges(spark, dir).orderBy("merge_rank").head()
    val (l, r) = (m.getAs[String]("lhs"), m.getAs[String]("rhs"))
    val word = l + r + l + r
    val enc0 = s" ${(l + r + l + r).map(_.toString).mkString("  ")} "
    val out = Seq(enc0).toDF("enc")
      .select(org.apache.spark.sql.functions.call_function("replace",
        col("enc"),
        org.apache.spark.sql.functions.lit(s" $l  $r "),
        org.apache.spark.sql.functions.lit(s" $l$r ")).as("enc"))
      .selectExpr("split(trim(enc), '  ') AS t").head().getSeq[String](0)
    assert(out == Seq(l + r, l + r),
      s"greedy apply on $word gave $out, expected both pairs merged")
  }

  test("per-language fertility (q141) is bounded by 1 and the max word " +
      "length, and global totals reconcile with q140") {
    val fert = SparkEntry
      .queries("q141_tokenizer_fertility")(spark, dir).collect()
    assert(fert.nonEmpty)
    fert.foreach { row =>
      val f = row.getAs[Double]("fertility")
      assert(f >= 1.0 && f <= 40.0, s"fertility out of range: $row")
    }
    val enc = SparkEntry.queries("q140_bpe_encode")(spark, dir)
      .selectExpr("sum(n_words) AS w", "sum(n_bpe_tokens) AS t").head()
    val (fw, ft) = (fert.map(_.getAs[Long]("n_words")).sum,
      fert.map(_.getAs[Long]("n_bpe_tokens")).sum)
    assert(enc.getLong(0) == fw && enc.getLong(1) == ft,
      "q140/q141 totals disagree")
  }

  test("row-local chained-apply token counts equal the q140 vocab-join " +
      "path for every document (apply-path == cache-path identity)") {
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select("doc_id", "text")
    val rowLocal = TextOps
      .bpeTokenCounts(docs, TextOps.bpeMergePairs(spark, dir))
      .select("doc_id", "n_bpe_tokens")
    val joined = SparkEntry.queries("q140_bpe_encode")(spark, dir)
      .select("doc_id", "n_bpe_tokens")
    assert(rowLocal.exceptAll(joined).isEmpty &&
      joined.exceptAll(rowLocal).isEmpty,
      "row-local BPE apply disagrees with the materialized word cache")
  }

  test("q149 staleness audit is self-consistent: token totals bound by " +
      "words and characters; iid sources price identically (q147 " +
      "agreement)") {
    val r = SparkEntry.queries("q149_tokenizer_staleness")(spark, dir)
      .head()
    val (w, st, fr) = (r.getAs[Long]("n_words"),
      r.getAs[Long]("tokens_stale"), r.getAs[Long]("tokens_fresh"))
    assert(st >= w && fr >= w, s"every word is >= 1 token: $r")
    // This corpus's sources are distributionally identical (q147
    // measures JS divergence ~4e-4), so the held-out vocabulary learns
    // the same merge ranking and the batch prices EQUAL under both —
    // the audit's no-drift fixed point. A drifted batch moves
    // inflation above 1.
    assert(r.getAs[Double]("inflation") == 1.0 && st == fr,
      s"iid corpus must show no staleness: $r")
  }

  private def SparkEntry = graft.SparkEntry
}
