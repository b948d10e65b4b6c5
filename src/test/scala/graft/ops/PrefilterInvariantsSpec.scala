package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws guarding the two round-6 candidate-generation plans whose
  * correctness rests on a pruning argument rather than on the oracle
  * formulation mirroring the plan:
  *
  *  - q113's char-8-gram prefix prefilter must be LOSSLESS: a contained
  *    text's first 8 chars necessarily occur among the container's
  *    8-grams, so the pruned plan must equal the brute-force
  *    nested-loop join row for row.
  *  - q125's maximal repeated spans must be internally consistent:
  *    spans within a document are disjoint and separated (maximality),
  *    and every span is backed by word-10-grams that genuinely occur
  *    in >= 2 distinct documents.
  */
class PrefilterInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q113 gram-prefilter plan == brute-force nested loop") {
    val pruned = graft.SparkEntry.queries("q113_substring_decontaminate")(
      spark, dir)
    val docs = graft.engine.Tables(spark, dir, "documents")
    val b = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("b_id"), col("text").as("b_text"))
    val c = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("c_id"), col("text").as("c_text"))
    val brute = c.join(broadcast(b),
        expr("instr(c_text, b_text) > 0 or instr(b_text, c_text) > 0"))
      .select(col("b_id"), col("c_id"),
        expr("instr(c_text, b_text) > 0").as("b_in_c"),
        expr("instr(b_text, c_text) > 0").as("c_in_b"))
    assert(pruned.count() == brute.count())
    assert(pruned.exceptAll(brute).isEmpty &&
      brute.exceptAll(pruned).isEmpty)
  }

  test("q113 prefilter is lossless WITHOUT the corpus length guarantee: " +
      "sub-8-char docs route through the direct fallback") {
    // The driver's corpora guarantee every doc >= 59 chars, so the
    // 8-char prefix gram always exists there; this corpus violates that
    // on BOTH sides — a 3-char bench doc hidden inside a corpus doc, a
    // 2-char corpus doc hidden inside a bench doc — and the fallback
    // branches must surface exactly what brute force finds.
    import spark.implicits._
    val b = Seq(
      (0L, "abc"), // sub-8 bench doc, contained in c_id 101
      (50L, "a benchmark zz passage long enough to carry eight-grams"))
      .toDF("b_id", "b_text")
    val c = Seq(
      (101L, "prefix abc suffix padding beyond eight chars"),
      (102L, "zz"), // sub-8 corpus doc, contained in b_id 50
      (103L, "xx a benchmark zz passage long enough to carry eight-grams yy"),
      (104L, "entirely unrelated corpus text with no containment at all"))
      .toDF("c_id", "c_text")
    val got = CorpusOps.substringDecontaminate(b, c)
    val brute = c.join(broadcast(b),
        expr("instr(c_text, b_text) > 0 or instr(b_text, c_text) > 0"))
      .select(col("b_id"), col("c_id"),
        expr("instr(c_text, b_text) > 0").as("b_in_c"),
        expr("instr(b_text, c_text) > 0").as("c_in_b"))
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      s"fallback-vs-brute mismatch: got ${got.collect().toSeq} " +
        s"want ${brute.collect().toSeq}")
    // both fallback directions actually fired (the main-path gram
    // probes alone would have missed them): the sub-8 bench doc found
    // inside a corpus doc, and the sub-8 corpus doc found inside a
    // bench doc
    assert(got.filter(col("b_id") === 0L && col("c_id") === 101L)
      .count() == 1)
    assert(got.filter(col("b_id") === 50L && col("c_id") === 102L &&
      col("c_in_b")).count() == 1)
  }

  test("q125 spans are disjoint-and-separated per doc, and backed by " +
      "genuinely repeated grams") {
    graft.functions.VectorExpressions.register(spark)
    val spans = graft.SparkEntry.queries("q125_repeated_spans")(spark, dir)
      .cache()
    // maximality: consecutive spans of one doc have a gap of at least
    // one non-repeating position between them
    val overlaps = spans
      .withColumn("prev_end", lag(col("end_pos"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("start_pos")))
      .filter(col("prev_end").isNotNull &&
        col("start_pos") <= col("prev_end") + 1)
    assert(overlaps.isEmpty, s"non-maximal spans: ${overlaps.take(3).toSeq}")
    // every span's grams are df >= 2: re-derive the repeated-position
    // set and check each span covers exactly its positions
    val g = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), expr("shingle_strings(text, 10)"))
    val rep = g.groupBy("sh")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select("sh")
    val repPos = g.join(rep, Seq("sh"), "left_semi")
      .select("doc_id", "pos")
    val claimed = spans.select(col("doc_id"),
      explode(expr("sequence(start_pos, end_pos)")).as("pos"))
    assert(claimed.exceptAll(repPos).isEmpty &&
      repPos.exceptAll(claimed).isEmpty,
      "span positions != repeated-gram positions")
    spans.unpersist()
  }
}
