package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the curation operators that the DuckDB oracle can't
  * express (the oracle pins the VALUES; these pin the semantic laws the
  * values must obey regardless of corpus).
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q81 redaction removes every span q80 counts — zero residual PII") {
    // Redacted text must contain no match of any scan pattern; proxy:
    // re-running the scan's regexes over a redaction round-trip finds
    // nothing, i.e. every doc q80 flags loses characters in q81.
    val scan = q("q80_pii_scan").select("doc_id", "has_pii")
    val red = q("q81_pii_redact").select("doc_id", "n_chars_removed")
    val joined = scan.join(red, "doc_id")
    val bad = joined.filter(col("has_pii") && col("n_chars_removed") <= 0)
    assert(bad.count() === 0, "a PII-flagged doc was not redacted")
    val clean = joined.filter(!col("has_pii") && col("n_chars_removed") =!= 0)
    assert(clean.count() === 0, "a clean doc was modified by redaction")
  }

  test("q85 bloom decontamination has no false negatives") {
    // Every benchmark doc probes its own positions → must be flagged
    // with exact_hit = true. (False positives are allowed; false
    // negatives never — that is the Bloom contract.)
    val out = q("q85_bloom_decontaminate")
    val docs = graft.engine.Tables(spark, dir, "documents")
    val m = docs.agg(max(col("doc_id"))).head.getLong(0)
    val benchIds = docs.filter(col("doc_id") > m - 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flaggedExact = out.filter(col("exact_hit"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchIds.subsetOf(flaggedExact),
      s"bench docs missing from flags: ${benchIds -- flaggedExact}")
  }

  test("q84 mixture targets sum to ~budget and flatten the distribution") {
    val rows = q("q84_domain_mixture").collect()
    val total = rows.map(_.getAs[Long]("target_docs")).sum
    assert(math.abs(total - 1000) <= rows.length,
      s"targets sum $total, want ~1000")
    // temperature 0.5 must shrink the majority class's share toward
    // uniform: mix_frac < p for the largest p, > p for the smallest
    val byP = rows.sortBy(_.getAs[Double]("p"))
    assert(byP.last.getAs[Double]("mix_frac") < byP.last.getAs[Double]("p"))
    assert(byP.head.getAs[Double]("mix_frac") > byP.head.getAs[Double]("p"))
  }

  test("q83 tf-idf ranks are dense 1..3 per doc and ordered by score") {
    val rows = q("q83_tfidf_top_terms").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to rs.length),
        s"doc $id ranks not dense")
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not descending")
    }
  }

  test("q82 keep implies every individual rule verdict") {
    val bad = q("q82_quality_filter").filter(col("keep") &&
      !(col("len_ok") && col("mwl_ok") && col("alpha_ok") &&
        col("stop_ok") && col("rep_ok")))
    assert(bad.count() === 0)
  }

  test("q144 mix execution realizes the planner's targets: full keep " +
      "when target >= source, Bernoulli-concentrated otherwise") {
    val rows = q("q144_mix_execute").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, target) = (r.getAs[Long]("src_tokens"),
        r.getAs[Long]("target_tokens"))
      val (kept, frac) = (r.getAs[Long]("kept_tokens"),
        r.getAs[Double]("realized_frac"))
      if (target >= src)
        assert(kept == src && frac == 1.0,
          s"source ${r.get(0)}: keep_frac 1 must keep everything: $r")
      else {
        val want = target.toDouble / src
        assert(math.abs(frac - want) <= 0.2,
          s"source ${r.get(0)}: realized $frac vs target frac $want")
        assert(kept < src, s"downsampled source kept everything: $r")
      }
    }
  }

  test("q146 Zipf fit is a valid regression (slope <= 0, r2 in [0,1]) " +
      "and q147 JS divergence sits in [0, ln 2]") {
    q("q146_zipf_fit").collect().foreach { r =>
      val (slope, r2) = (r.getAs[Double]("zipf_slope"),
        r.getAs[Double]("r2"))
      assert(slope <= 0.0, s"frequency must not rise with rank: $r")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r")
    }
    q("q147_source_drift").collect().foreach { r =>
      val js = r.getAs[Double]("js_div")
      assert(js >= 0.0 && js <= math.log(2) + 1e-9,
        s"JS divergence out of [0, ln 2]: $r")
    }
  }
}
