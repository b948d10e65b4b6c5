package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.engine.Tables

/** Corpus-management operators for a training-data pipeline: deterministic
  * dataset splitting, stratified sampling, and benchmark decontamination.
  *
  * All splits/samples are CONTENT-ADDRESSED (sha256 of a salted key), not
  * `rand()`-based: the same document lands in the same split on every
  * run, any cluster size, any partitioning — reproducibility that random
  * sampling cannot give, and the property that makes held-out sets stable
  * as the corpus grows. Bucket comparison happens on the hash's hex
  * PREFIX (lowercase hex compares lexicographically like its numeric
  * value — same trick as q45's SimHash bits), which keeps the predicate
  * portable ANSI SQL.
  *
  * Scale: split/sample are per-row expressions (no shuffle at all —
  * they fuse into the scan); decontamination is one shuffle on the
  * shingle hash, with the benchmark side orders of magnitude smaller
  * than the corpus.
  */
object CorpusOps {

  /** 256 hex-prefix buckets: '00'..'ff'. 'cd' = 205/256 ≈ 80 %,
    * 'e6' = 230/256 ≈ 90 % — a standard 80/10/10 split.
    */
  private val splitCase =
    "CASE WHEN substr(h, 1, 2) < 'cd' THEN 'train' " +
      "WHEN substr(h, 1, 2) < 'e6' THEN 'val' ELSE 'test' END"

  val defs: Seq[QueryDef] = Seq(

    // Deterministic 80/10/10 train/val/test assignment + per-split sizes.
    QueryDef(
      "q36_hash_split",
      s"""WITH h AS (SELECT doc_id,
         |    sha256('split-v1|' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |s AS (SELECT doc_id, $splitCase AS split FROM h)
         |SELECT split, COUNT(*) AS n,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          sha2(concat(lit("split-v1|"), col("doc_id").cast("string")), 256)
            .as("h"))
        .select(col("doc_id"), expr(splitCase).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).cast("long").as("min_id"))
        .orderBy("split")
    },

    // Stratified sampling: per-language keep-rates (here: downsample the
    // majority 'en' class to 20 %, keep the rest), content-addressed so
    // the sample is stable run-over-run. Output: per-language kept counts.
    QueryDef(
      "q38_stratified_sample",
      """WITH k AS (SELECT doc_id, lang,
        |    substr(sha256('sample-v1|' || CAST(doc_id AS VARCHAR)), 1, 2)
        |      AS b
        |  FROM documents),
        |s AS (SELECT doc_id, lang FROM k
        |  WHERE lang <> 'en' OR b < '33')
        |SELECT lang, COUNT(*) AS n_kept,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_kept_id
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          substring(sha2(concat(lit("sample-v1|"),
            col("doc_id").cast("string")), 256), 1, 2).as("b"))
        .filter(col("lang") =!= "en" || col("b") < "33")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          min(col("doc_id")).cast("long").as("min_kept_id"))
        .orderBy("lang")
    },

    // Benchmark decontamination: training docs that share any word-3-gram
    // with a "benchmark" set (stand-in: the last 10 doc_ids) must be
    // flagged before training. Output: per contaminated train doc, how
    // many distinct benchmark shingles it contains and the worst overlap
    // ratio. The shuffle key is the shingle string; the benchmark side is
    // tiny (broadcast at scale).
    QueryDef(
      "q37_decontaminate",
      """WITH d AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |mx AS (SELECT MAX(doc_id) AS m FROM documents),
        |b AS (SELECT doc_id, unnest(sh) AS sh FROM d, mx
        |      WHERE doc_id > m - 10),
        |t AS (SELECT doc_id, unnest(sh) AS sh FROM d, mx
        |      WHERE doc_id <= m - 10),
        |hits AS (
        |  SELECT t.doc_id, COUNT(DISTINCT t.sh) AS n_shared
        |  FROM t JOIN (SELECT DISTINCT sh FROM b) bb ON t.sh = bb.sh
        |  GROUP BY t.doc_id)
        |SELECT h.doc_id, h.n_shared,
        |  CAST(h.n_shared AS DOUBLE) / len(d.sh) AS overlap
        |FROM hits h JOIN d ON d.doc_id = h.doc_id
        |ORDER BY h.doc_id""".stripMargin) { (s, dir) =>
      // Shingles compare as 64-bit hashes (the ShingleHashes generator),
      // not strings — identical counts modulo xxhash64 collisions, same
      // reasoning as q43. The benchmark id boundary comes from a
      // broadcast scalar subquery (no driver-side action).
      val docs = Tables(s, dir, "documents")
      val sh = DedupOps.shingleHashes(docs).distinct()
      val mx = broadcast(docs.agg(max(col("doc_id")).as("m")))
      val bench = sh.crossJoin(mx).filter(col("doc_id") > col("m") - 10)
        .select("h").distinct()
      val train = sh.crossJoin(mx).filter(col("doc_id") <= col("m") - 10)
        .select("doc_id", "h")
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      train
        .join(broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .join(counts, "doc_id")
        .select(col("doc_id"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_sh")).as("overlap"))
        .orderBy("doc_id")
    },

    // Balanced per-class downsampling: cap every language at N docs,
    // chosen by CONTENT-HASH order — like q36's splits, the selection is
    // a pure function of the data (no RNG, no partition-count
    // dependence), so the same corpus downsamples identically on any
    // cluster. One window per class partition; no shuffle beyond it.
    QueryDef(
      "q76_balanced_downsample",
      """SELECT lang, doc_id, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY sha256(text), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("lang")
        .orderBy(sha2(col("text"), 256), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 50)
        .orderBy("lang", "doc_id")
    },

    // Sequence packing: concatenate each shard's documents in
    // deterministic order and assign every document its token offset,
    // context-window id (budget 2048), and offset within the window —
    // the pack-assignment step of LLM pretraining, as ONE running-sum
    // window per shard (linear, no join; the 100 TB shape is a single
    // ordered pass per shard partition).
    QueryDef(
      "q77_pack_assignment",
      """WITH t AS (SELECT source, doc_id,
        |    len(string_split(text, ' ')) AS n_tok FROM documents),
        |o AS (SELECT source, doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tok_offset
        |  FROM t)
        |SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(tok_offset AS BIGINT) AS tok_offset,
        |  CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
        |  CAST(tok_offset % 2048 AS BIGINT) AS pack_offset
        |FROM o ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr("cast(size(split(text, ' ')) as bigint)").as("n_tok"))
        .withColumn("tok_offset",
          coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_tok"),
          col("tok_offset"),
          expr("tok_offset div 2048").as("pack_id"),
          expr("tok_offset % 2048").as("pack_offset"))
        .orderBy("source", "doc_id")
    },

    // Exact substring decontamination — the strictest of the four
    // contamination modes (q37 whole-text equality, q85 Bloom
    // membership, q107 n-gram overlap fraction, and this): flag a
    // training doc if a benchmark document appears inside it verbatim
    // (or vice versa — an excerpted benchmark).
    //
    // Candidates come from an EXACT char-8-gram prefix filter, not a
    // nested loop: if text A appears inside text B, then A's first 8
    // characters occur as one of B's char 8-grams — so (bench-in-corpus)
    // candidates are the corpus grams that hit a broadcast set of bench
    // prefixes, and (corpus-in-bench) candidates are the bench grams
    // that hit the corpus's prefixes. Both probes filter AT THE
    // GENERATOR (a broadcast hash probe per gram, ~everything drops
    // before any exchange), surviving pairs dedup, and only those pairs
    // pay the verbatim instr() verification both ways. Round 5 shipped
    // the |bench|×|corpus| BroadcastNestedLoopJoin — fine while the
    // bench side is O(100), but the sf1 scaling smoke measured it 92×
    // for 10× data (both sides grew); the gram-probe plan is linear in
    // corpus chars + candidate hits, which is the shape that survives
    // 100 TB. The filter is lossless by the substring-implies-gram
    // containment argument UNIVERSALLY: documents shorter than 8 chars
    // (whose prefix gram doesn't exist) route through an explicit
    // direct-verification branch — see [[substringDecontaminate]] — so
    // no corpus-length precondition remains. The DuckDB oracle keeps
    // the direct nested-loop formulation — same output, affordable at
    // oracle scale.
    QueryDef(
      "q113_substring_decontaminate",
      """WITH b AS (SELECT doc_id AS b_id, text AS b_text FROM documents
        |  WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id AS c_id, text AS c_text FROM documents
        |  WHERE doc_id % 50 <> 0)
        |SELECT b_id, c_id,
        |  position(b_text IN c_text) > 0 AS b_in_c,
        |  position(c_text IN b_text) > 0 AS c_in_b
        |FROM b JOIN c ON position(b_text IN c_text) > 0
        |  OR position(c_text IN b_text) > 0
        |ORDER BY b_id, c_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val b = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("b_id"), col("text").as("b_text"))
      val c = docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id").as("c_id"), col("text").as("c_text"))
      substringDecontaminate(b, c).orderBy("b_id", "c_id")
    },

    // The composed CONTAMINATION REPORT — the decontamination
    // dashboard a training run signs off on: per benchmark document,
    // how many training docs hit it under each mode — exact full-text
    // equality (q37/q40's tier), >= 5% word-3-gram overlap (q107's
    // GPT-3-report tier), and verbatim substring containment either
    // direction (q113's strictest tier) — plus the single contaminated
    // verdict. Each mode is the SAME plan its standalone query runs
    // (broadcast bench side, corpus side one scan; the substring tier
    // via the universally-lossless gram prefilter), so the report costs
    // three bench-sized aggregates over already-linear probes, and each
    // mode's counts are pinned by its standalone oracle while THIS
    // oracle pins the composition.
    QueryDef(
      "q131_contamination_report",
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |    range(1, len(ws) - 1),
        |    i -> array_to_string(ws[i:i+2], ' '))) AS ng FROM w),
        |bg AS (SELECT doc_id AS b_id, ng FROM g WHERE doc_id % 50 = 0),
        |cg AS (SELECT doc_id AS c_id, ng FROM g WHERE doc_id % 50 <> 0),
        |bn AS (SELECT b_id, COUNT(*) AS n_b FROM bg GROUP BY 1),
        |ngr AS (SELECT b_id, COUNT(DISTINCT c_id) AS n_ngram FROM (
        |    SELECT o.b_id, o.c_id FROM (
        |      SELECT b_id, c_id, COUNT(*) AS hits FROM bg
        |      JOIN cg USING (ng) GROUP BY 1, 2) o
        |    JOIN bn USING (b_id)
        |    WHERE CAST(hits AS DOUBLE) / n_b >= 0.05) t GROUP BY 1),
        |b AS (SELECT doc_id AS b_id, text AS b_text FROM documents
        |  WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id AS c_id, text AS c_text FROM documents
        |  WHERE doc_id % 50 <> 0),
        |ex AS (SELECT b_id, COUNT(DISTINCT c_id) AS n_exact
        |  FROM b JOIN c ON b_text = c_text GROUP BY 1),
        |sub AS (SELECT b_id, COUNT(DISTINCT c_id) AS n_substring
        |  FROM b JOIN c ON position(b_text IN c_text) > 0
        |    OR position(c_text IN b_text) > 0 GROUP BY 1)
        |SELECT b.b_id,
        |  CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact,
        |  CAST(COALESCE(ngr.n_ngram, 0) AS BIGINT) AS n_ngram,
        |  CAST(COALESCE(sub.n_substring, 0) AS BIGINT) AS n_substring,
        |  COALESCE(ex.n_exact, 0) + COALESCE(ngr.n_ngram, 0)
        |    + COALESCE(sub.n_substring, 0) > 0 AS contaminated
        |FROM b LEFT JOIN ex USING (b_id) LEFT JOIN ngr USING (b_id)
        |LEFT JOIN sub USING (b_id)
        |ORDER BY b.b_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val docs = Tables(s, dir, "documents")
      val b = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("b_id"), col("text").as("b_text"))
      val c = docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id").as("c_id"), col("text").as("c_text"))
      val exact = b.join(c, col("b_text") === col("c_text"))
        .groupBy("b_id").agg(countDistinct(col("c_id")).as("n_exact"))
      val g = docs
        .select(col("doc_id"), expr("shingle_strings(lower(text), 3)"))
        .select(col("doc_id"), col("sh").as("ng")).distinct()
      val bg = g.filter(col("doc_id") % 50 === 0).toDF("b_id", "ng")
      val cg = g.filter(col("doc_id") % 50 =!= 0).toDF("c_id", "ng")
      val bn = bg.groupBy("b_id").agg(count(lit(1)).as("n_b"))
      val ngram = cg.join(broadcast(bg), "ng")
        .groupBy("b_id", "c_id").agg(count(lit(1)).as("hits"))
        .join(broadcast(bn), "b_id")
        .filter(col("hits").cast("double") / col("n_b") >= 0.05)
        .groupBy("b_id").agg(countDistinct(col("c_id")).as("n_ngram"))
      val sub = substringDecontaminate(b, c)
        .groupBy("b_id").agg(countDistinct(col("c_id")).as("n_substring"))
      b.select("b_id")
        .join(exact, Seq("b_id"), "left")
        .join(ngram, Seq("b_id"), "left")
        .join(sub, Seq("b_id"), "left")
        .select(col("b_id"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("n_ngram"), lit(0L)).as("n_ngram"),
          coalesce(col("n_substring"), lit(0L)).as("n_substring"))
        .withColumn("contaminated",
          col("n_exact") + col("n_ngram") + col("n_substring") > 0)
        .orderBy("b_id")
    },

    // Longest verbatim overlap — the memorization/contamination METRIC
    // (Lee et al. / Carlini et al.: "how many words of this benchmark
    // doc appear verbatim in training data?"): per bench doc, the
    // longest contiguous word span shared with ANY corpus doc, plus the
    // argmax doc. Exact via the DIAGONAL trick: word-8-grams matched
    // between bench doc b and corpus doc c at alignment diag = cpos -
    // bpos are contiguous in BOTH documents iff their bench positions
    // form a run — so longest-common-substring-in-words = max over
    // (b, c, diag) of (run length + 7), a gaps-and-islands window over
    // the matched-gram set, never a quadratic alignment. Scale shape:
    // the bench side's grams broadcast (the q107/q113 boundary), the
    // corpus side is ONE generator pass probing that set, and
    // everything downstream is sized by matched grams (hits-bounded,
    // like q107). Docs sharing no 8-gram report span 0 / null partner.
    QueryDef(
      "q137_longest_overlap",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    array_to_string(list_slice(w, i, i + 7), ' ') AS sh
        |  FROM d, unnest(range(1, len(w) - 6)) AS t(i)),
        |b AS (SELECT doc_id AS b_id, pos AS bpos, sh FROM g
        |  WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id AS c_id, pos AS cpos, sh FROM g
        |  WHERE doc_id % 50 <> 0),
        |m AS (SELECT b_id, bpos, c_id, cpos - bpos AS diag
        |  FROM b JOIN c USING (sh)),
        |r AS (SELECT b_id, c_id, diag, bpos,
        |    bpos - ROW_NUMBER() OVER (
        |      PARTITION BY b_id, c_id, diag ORDER BY bpos) AS grp
        |  FROM m),
        |runs AS (SELECT b_id, c_id, COUNT(*) + 7 AS span
        |  FROM r GROUP BY b_id, c_id, diag, grp),
        |best AS (SELECT b_id, MAX(span) AS span FROM runs GROUP BY b_id),
        |pick AS (SELECT runs.b_id, MIN(runs.c_id) AS c_id, best.span
        |  FROM runs JOIN best ON best.b_id = runs.b_id
        |    AND runs.span = best.span
        |  GROUP BY runs.b_id, best.span)
        |SELECT bb.b_id,
        |  CAST(COALESCE(pick.span, 0) AS BIGINT) AS span_words,
        |  pick.c_id
        |FROM (SELECT doc_id AS b_id FROM documents WHERE doc_id % 50 = 0)
        |  bb
        |LEFT JOIN pick ON pick.b_id = bb.b_id
        |ORDER BY bb.b_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val g = Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(text, 8)"))
      val b = g.filter(col("doc_id") % 50 === 0).toDF("b_id", "bpos", "sh")
      val c = g.filter(col("doc_id") % 50 =!= 0).toDF("c_id", "cpos", "sh")
      val w = Window.partitionBy("b_id", "c_id", "diag").orderBy("bpos")
      val runs = c.join(broadcast(b), "sh")
        .select(col("b_id"), col("bpos"), col("c_id"),
          (col("cpos") - col("bpos")).as("diag"))
        .withColumn("grp", col("bpos") - row_number().over(w))
        .groupBy("b_id", "c_id", "diag", "grp")
        .agg((count(lit(1)) + 7).as("span"))
      val best = runs.groupBy("b_id").agg(max(col("span")).as("span"))
      val pick = runs.join(best, Seq("b_id", "span"))
        .groupBy("b_id", "span").agg(min(col("c_id")).as("c_id"))
      Tables(s, dir, "documents").filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("b_id"))
        .join(pick, Seq("b_id"), "left")
        .select(col("b_id"),
          coalesce(col("span"), lit(0L)).as("span_words"), col("c_id"))
        .orderBy("b_id")
    },

    // Pack materialization — q77 assigns (doc → pack, offset); this
    // emits the packs themselves: per (source, pack) the document
    // order, doc count, and token fill. The doc_order string is what a
    // sequence-building job consumes (and what makes packing auditable:
    // offsets are a prefix sum, so pack fill ≈ 2048 except each
    // source's tail). One window (the q77 prefix sum) + one (source,
    // pack) aggregate whose payload is ids — the text never moves.
    QueryDef(
      "q115_pack_materialize",
      """WITH t AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (SELECT source, doc_id, n_tok,
        |    COALESCE(CAST(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS BIGINT), 0) AS tok_offset FROM t)
        |SELECT source, CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  string_agg(doc_id, ',' ORDER BY tok_offset) AS doc_order
        |FROM o GROUP BY source, tok_offset // 2048
        |ORDER BY source, pack_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          expr("cast(size(split(text, ' ')) as bigint)").as("n_tok"))
        .withColumn("tok_offset",
          coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .groupBy(col("source"),
          expr("tok_offset div 2048").as("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          expr("array_join(transform(array_sort(collect_list(" +
            "struct(tok_offset, doc_id))), " +
            "t -> cast(t.doc_id as string)), ',')").as("doc_order"))
        .orderBy("source", "pack_id")
    },

    // Reproducible epoch shuffle — the training-order step between
    // packing and the data loader: every epoch gets an independent,
    // content-addressed permutation (key = sha256(salt|epoch|doc_id)),
    // docs land in 16 hash shards (the key's first hex char), and each
    // shard is ordered by key. NO global sort at any scale: shard
    // assignment is a row-local projection and the per-shard order is a
    // partition-local window — the exact layout a multi-worker loader
    // consumes (worker w reads shard w in pos order), identical on 1
    // executor or 1000. Epochs differ (the salt includes the epoch),
    // runs don't (nothing is random).
    QueryDef(
      "q142_epoch_shuffle",
      """WITH e AS (SELECT CAST(i AS INTEGER) AS epoch
        |  FROM (SELECT unnest(range(0, 2)) AS i) t),
        |h AS (SELECT e.epoch, d.doc_id,
        |    sha256('shuffle-v1|' || CAST(e.epoch AS VARCHAR) || '|'
        |      || CAST(d.doc_id AS VARCHAR)) AS h
        |  FROM documents d CROSS JOIN e)
        |SELECT epoch, substr(h, 1, 1) AS shard, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, substr(h, 1, 1)
        |    ORDER BY h) AS BIGINT) AS pos
        |FROM h ORDER BY epoch, shard, pos""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("epoch", "shard").orderBy("h")
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(1))).as("epoch"))
        .withColumn("h", sha2(concat(lit("shuffle-v1|"),
          col("epoch").cast("string"), lit("|"),
          col("doc_id").cast("string")), 256))
        .withColumn("shard", substring(col("h"), 1, 1))
        .select(col("epoch"), col("shard"), col("doc_id"),
          row_number().over(w).cast("long").as("pos"))
        .orderBy("epoch", "shard", "pos")
    },

    // Sequence packing under the REAL token budget — q77's pack
    // assignment re-priced from whitespace tokens to the learned BPE
    // vocabulary's counts (q139/q140): what the training job actually
    // fits into a 2048-token context window. Composition is one extra
    // word-keyed join against the materialized encoded vocabulary (the
    // q140 shape) feeding the same per-source prefix-sum window; the
    // corpus text itself still never moves.
    QueryDef("q143_bpe_pack", TextOps.bpeLearnSql(TextOps.BpeMerges) +
      TextOps.bpeDocSql() + TextOps.bpePackSql +
      s"""
         |SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |  CAST(tok_offset AS BIGINT) AS tok_offset,
         |  CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
         |  CAST(tok_offset % 2048 AS BIGINT) AS pack_offset
         |FROM o ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
      TextOps.bpePackOffsets(s, dir)
        .select(col("source"), col("doc_id"), col("n_tok"),
          col("tok_offset"),
          expr("tok_offset div 2048").as("pack_id"),
          expr("tok_offset % 2048").as("pack_offset"))
        .orderBy("source", "doc_id")
    },

    // Loader manifest — the capstone composition of the training-data
    // export: BPE-priced packing (q143) → reproducible epoch shuffle of
    // the PACKS (q142's scheme, keyed by source:pack) → per-(epoch,
    // shard) manifest with pack/token counts and an ORDER FINGERPRINT
    // (sha256 of the shard's pack keys in position order) — what a
    // multi-worker loader mounts, and what an integrity check compares
    // after any re-export. Every stage reuses its oracle-pinned
    // machinery; the composition itself is hash-checked end-to-end.
    // Scale shape: the corpus-sized work is exactly q143's (one token
    // partial-agg + vocab join + per-source window); everything after
    // operates on PACKS (corpus_tokens / 2048 rows), and the shard
    // manifest is a 16-way aggregate per epoch with an ordered
    // fingerprint fold.
    QueryDef("q148_loader_manifest", TextOps.bpeLearnSql(TextOps.BpeMerges) +
      TextOps.bpeDocSql() + TextOps.bpePackSql +
      s""",
         |packs AS (SELECT source,
         |    CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
         |    CAST(sum(n_tok) AS BIGINT) AS pack_tokens
         |  FROM o GROUP BY source, tok_offset // 2048),
         |e AS (SELECT CAST(i AS INTEGER) AS epoch
         |  FROM (SELECT unnest(range(0, 2)) AS i) t),
         |ph AS (SELECT e.epoch, p.source, p.pack_id, p.pack_tokens,
         |    sha256('pack-shuffle-v1|' || CAST(e.epoch AS VARCHAR) || '|'
         |      || p.source || '|' || CAST(p.pack_id AS VARCHAR)) AS h
         |  FROM packs p CROSS JOIN e),
         |pos AS (SELECT epoch, substr(h, 1, 1) AS shard, source, pack_id,
         |    pack_tokens, ROW_NUMBER() OVER (
         |      PARTITION BY epoch, substr(h, 1, 1) ORDER BY h) AS pos
         |  FROM ph)
         |SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_packs,
         |  CAST(sum(pack_tokens) AS BIGINT) AS n_tokens,
         |  sha256(string_agg(source || ':' || CAST(pack_id AS VARCHAR),
         |    ',' ORDER BY pos)) AS order_sha
         |FROM pos GROUP BY epoch, shard
         |ORDER BY epoch, shard""".stripMargin) { (s, dir) =>
      val packs = TextOps.bpePackOffsets(s, dir)
        .groupBy(col("source"),
          expr("tok_offset div 2048").as("pack_id"))
        .agg(sum("n_tok").as("pack_tokens"))
      val wPos = Window.partitionBy("epoch", "shard").orderBy("h")
      packs
        .select(col("source"), col("pack_id"), col("pack_tokens"),
          explode(sequence(lit(0), lit(1))).as("epoch"))
        .withColumn("h", sha2(concat(lit("pack-shuffle-v1|"),
          col("epoch").cast("string"), lit("|"), col("source"),
          lit("|"), col("pack_id").cast("string")), 256))
        .withColumn("shard", substring(col("h"), 1, 1))
        .withColumn("pos", row_number().over(wPos))
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_packs"),
          sum("pack_tokens").as("n_tokens"),
          sha2(array_join(transform(array_sort(collect_list(
            struct(col("pos"), concat(col("source"), lit(":"),
              col("pack_id").cast("string")).as("k")))),
            t => t.getField("k")), ","), 256).as("order_sha"))
        .orderBy("epoch", "shard")
    },

    // CURRICULUM pack ordering — the export step between packing
    // (q143) and the loader (q148) for curriculum training: each pack's
    // DIFFICULTY is the token-weighted mean of its documents' trigram
    // LM scores (q94's artifact — higher log-prob = more typical =
    // easier), and packs are ranked easy→hard WITHIN EACH SOURCE (the
    // per-source window keeps the ordering scale-clean; a global
    // curriculum would sort all packs — fine at packs = tokens/2048,
    // but the per-source stream is what loaders consume anyway).
    // Determinism: doc scores are the round-6 artifact values, weighted
    // sums accumulate in decimal, the division floor-scales, and the
    // rank breaks ties by pack_id. Corpus-sized work is exactly q143's
    // pricing pass + q94's scoring pass, both artifact-backed.
    QueryDef(
      "q191_curriculum_packs",
      TextOps.bpeLearnSql(TextOps.BpeMerges) + TextOps.bpeDocSql() +
        TextOps.bpePackSql +
        s""",
           |pk AS (SELECT source, doc_id, n_tok,
           |    tok_offset // 2048 AS pack_id FROM o),
           |tri AS (SELECT doc_id, unnest(list_transform(
           |    range(1, length(text) - 1), i -> substr(text, i, 3))) AS t
           |  FROM documents WHERE length(text) >= 3),
           |c3 AS (SELECT t, count(*) AS n3 FROM tri GROUP BY t),
           |c2 AS (SELECT substr(t, 1, 2) AS p, sum(n3) AS n2 FROM c3
           |  GROUP BY p),
           |scr AS (SELECT tri.doc_id,
           |    round(CAST(SUM(CAST(round(ln(CAST(n3 AS DOUBLE) / n2), 9)
           |      AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
           |      AS mean_logp
           |  FROM tri JOIN c3 ON c3.t = tri.t
           |  JOIN c2 ON c2.p = substr(tri.t, 1, 2)
           |  GROUP BY tri.doc_id),
           |pd AS (SELECT pk.source, pk.pack_id,
           |    CAST(sum(pk.n_tok) AS BIGINT) AS pack_tokens,
           |    floor(CAST(SUM(CAST(scr.mean_logp AS DECIMAL(18,6))
           |        * pk.n_tok) AS DOUBLE)
           |      / sum(pk.n_tok) * 1000000) / 1000000.0 AS difficulty
           |  FROM pk JOIN scr ON scr.doc_id = pk.doc_id
           |  GROUP BY pk.source, pk.pack_id)
           |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
           |  pack_tokens, difficulty,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY source
           |    ORDER BY difficulty DESC, pack_id) AS INTEGER)
           |    AS cur_rank
           |FROM pd ORDER BY source, cur_rank""".stripMargin) { (s, dir) =>
      val pk = TextOps.bpePackOffsets(s, dir)
        .select(col("source"), col("doc_id"), col("n_tok"),
          expr("tok_offset div 2048").as("pack_id"))
      val pd = pk
        .join(CurationOps.docLmScores(s, dir), "doc_id")
        .groupBy("source", "pack_id")
        .agg(sum("n_tok").as("pack_tokens"),
          (floor(sum(col("mean_logp").cast(DecimalType(18, 6))
              * col("n_tok")).cast("double")
            / sum("n_tok") * 1000000) / 1000000.0).as("difficulty"))
      pd.select(col("source"), col("pack_id"), col("pack_tokens"),
          col("difficulty"),
          row_number().over(Window.partitionBy("source")
            .orderBy(col("difficulty").desc, col("pack_id")))
            .cast("int").as("cur_rank"))
        .orderBy("source", "cur_rank")
    },

    // Benchmark NOVELTY rate — the inverse of contamination (q107 asks
    // "how much of the bench is IN the corpus"; this asks "how much of
    // the bench is genuinely NEW"): per benchmark doc, the fraction of
    // its distinct word-3-grams that appear NOWHERE in the training
    // corpus. Low novelty means the eval set can be answered from
    // memorized surface forms — an eval-design defect contamination
    // checks alone don't flag. One anti-join of the bench docs'
    // (distinct) grams against the corpus gram set; the corpus side is
    // the big-but-aggregated frame, the bench side is tiny.
    QueryDef(
      "q196_benchmark_novelty",
      """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2]))) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |b AS (SELECT g.doc_id, g.sh FROM g, mx WHERE g.doc_id > m - 10),
        |t AS (SELECT DISTINCT g.sh FROM g, mx WHERE g.doc_id <= m - 10),
        |nv AS (SELECT b.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN t.sh IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_unseen
        |  FROM b LEFT JOIN t ON t.sh = b.sh GROUP BY b.doc_id)
        |SELECT doc_id, n_grams, n_unseen,
        |  floor(n_unseen / CAST(n_grams AS DOUBLE) * 1000000)
        |    / 1000000.0 AS novelty
        |FROM nv ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Artifact-served (round-7 verdict item 7): both sides of the
      // anti-join read the materialized distinct-shingle-HASH table
      // (q43/q47/q48's shared base) instead of re-shingling the corpus
      // per run, and the train-side distinct gram set is itself a
      // Materialize artifact — per corpus version the heavy distinct
      // runs once, then this query is two columnar artifact reads. The
      // hash-for-string substitution is the same collision-free-at-
      // this-scale equivalence every exact-Jaccard consumer already
      // relies on. The 1-row max() collect is bounded metadata (the
      // bench split point), and turning it into a literal lets the
      // doc_id predicate push into the artifact's parquet scan.
      val docs = Tables(s, dir, "documents")
      val m = docs.agg(max("doc_id")).head().getLong(0)
      val g = DedupOps.distinctShingles(s, dir).toDF("doc_id", "h")
      val t = graft.engine.Materialize.table(s, "novelty_train_grams",
          dir) {
        g.filter(col("doc_id") <= m - 10).select("h").distinct()
      }
      g.filter(col("doc_id") > m - 10)
        .join(t.withColumn("hit", lit(1)), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_unseen"))
        .select(col("doc_id"), col("n_grams"), col("n_unseen"),
          (floor(col("n_unseen") / col("n_grams").cast("double")
            * 1000000) / 1000000.0).as("novelty"))
        .orderBy("doc_id")
    },

    // Content-addressed WORD-DROPOUT augmentation — reproducible data
    // augmentation at any cluster size: word w at position p of doc d
    // drops iff the first two hex digits of sha256(aug-v1|d|p) fall
    // under the 20% keep-threshold — a pure function of (doc, pos), so
    // the augmented corpus is bit-identical on every run and every
    // partitioning (rand()-based dropout is neither), and re-derivable
    // by auditors. Output per doc: word counts before/after and the
    // sha256 of the augmented text — the receipt a training run records
    // so the exact augmented bytes can be regenerated later. Re-assembly
    // is the q148 ordered-fold discipline (position-sorted array_join),
    // per-doc bounded.
    QueryDef(
      "q197_word_dropout",
      """WITH w AS (SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
        |    string_split(text, ' ')[u.i + 1] AS wd
        |  FROM documents,
        |  LATERAL unnest(range(0, len(string_split(text, ' ')))) AS u(i)),
        |k AS (SELECT doc_id, pos, wd,
        |    CAST(substr(sha256('aug-v1|' || CAST(doc_id AS VARCHAR)
        |      || '|' || CAST(pos AS VARCHAR)), 1, 2) >= '33'
        |      AS INTEGER) AS keep
        |  FROM w),
        |a AS (SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(keep) AS BIGINT) AS n_kept,
        |    sha256(string_agg(CASE WHEN keep = 1 THEN wd END, ' '
        |      ORDER BY pos)) AS aug_sha
        |  FROM k GROUP BY doc_id)
        |SELECT doc_id, n_words, n_kept, aug_sha FROM a
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = "split(text, ' ')"
      val k = Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(words)))
        .toDF("doc_id", "pos", "wd")
        .select(col("doc_id"), col("pos"), col("wd"),
          (substring(sha2(concat(lit("aug-v1|"),
            col("doc_id").cast("string"), lit("|"),
            col("pos").cast("string")), 256), 1, 2) >= "33")
            .cast("int").as("keep"))
      k.groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("keep").as("n_kept"),
          sha2(array_join(transform(array_sort(collect_list(
            when(col("keep") === 1,
              struct(col("pos"), col("wd"))))),
            t => t.getField("wd")), " "), 256).as("aug_sha"))
        .orderBy("doc_id")
    },

    // INTRA-PACK duplication audit — the packing-safety question the
    // dedup funnel doesn't ask: did the q143 packer juxtapose two
    // NEAR-DUPLICATE documents inside one 2048-token context window
    // (attention spent re-reading the same content, and a gradient
    // toward copying)? Near-dup edges come from the materialized LSH
    // candidate artifact; each edge's endpoints look up their (source,
    // pack) assignment, and the audit reports how many edges landed
    // same-pack. Pairs-bounded work on top of q143's pricing pass.
    QueryDef(
      "q194_intra_pack_dups",
      TextOps.bpeLearnSql(TextOps.BpeMerges) + TextOps.bpeDocSql() +
        TextOps.bpePackSql +
        s""",
           |pk AS (SELECT source, doc_id, tok_offset // 2048 AS pack_id
           |  FROM o),
           |rr AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
           |  GROUP BY text),
           |  """.stripMargin +
        DedupOps.lshPairsSqlPublic("rr") +
        """,
          |ej AS (SELECT p.a_id, p.b_id,
          |    CAST(pa.source = pb.source AND pa.pack_id = pb.pack_id
          |      AS INTEGER) AS same_pack
          |  FROM pairs p JOIN pk pa ON pa.doc_id = p.a_id
          |  JOIN pk pb ON pb.doc_id = p.b_id)
          |SELECT CAST(count(*) AS BIGINT) AS n_edges,
          |  CAST(sum(same_pack) AS BIGINT) AS n_same_pack,
          |  CASE WHEN count(*) = 0 THEN 0.0
          |    ELSE floor(sum(same_pack) / CAST(count(*) AS DOUBLE)
          |      * 1000000) / 1000000.0 END AS same_pack_frac
          |FROM ej""".stripMargin) { (s, dir) =>
      val pk = TextOps.bpePackOffsets(s, dir)
        .select(col("source"), col("doc_id"),
          expr("tok_offset div 2048").as("pack_id"))
      DedupOps.lshCandidates(s, dir).select("a_id", "b_id")
        .join(pk.toDF("src_a", "a_id", "pk_a"), "a_id")
        .join(pk.toDF("src_b", "b_id", "pk_b"), "b_id")
        .select((col("src_a") === col("src_b") &&
          col("pk_a") === col("pk_b")).cast("int").as("same_pack"))
        .agg(count(lit(1)).as("n_edges"),
          sum("same_pack").as("n_same_pack"))
        .select(col("n_edges"), col("n_same_pack"),
          when(col("n_edges") === 0, lit(0.0))
            .otherwise(floor(col("n_same_pack")
              / col("n_edges").cast("double") * 1000000) / 1000000.0)
            .as("same_pack_frac"))
    },

    // Stratified SYSTEMATIC PPS sampling (probability proportional to
    // size): per source, k=5 evenly-spaced positions on that source's
    // cumulative-character line — p_j = floor((2j+1)·W / 2k) — and the
    // sample is whichever document's [cum, cum+w) interval contains
    // each position. The survey-sampling standard for "pick documents
    // proportional to their token mass, deterministically": zero
    // randomness, zero floats (integer cumsums, integer division), so
    // the sample is reproducible at any cluster size and re-derivable
    // by auditors. Scale shape: the cumsum window partitions by source
    // (parallel across strata); the position probe is a per-source
    // 5-row broadcast against the interval frame.
    QueryDef(
      "q173_pps_sample",
      """WITH c AS (SELECT source, doc_id,
        |    CAST(n_chars AS BIGINT) AS w,
        |    COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum,
        |    SUM(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source)
        |      AS tw
        |  FROM documents),
        |p AS (SELECT source, CAST(j AS INTEGER) AS j,
        |    ((2 * j + 1) * tw) // 10 AS pos
        |  FROM (SELECT DISTINCT source, tw FROM c) s,
        |    (SELECT unnest(range(0, 5)) AS j) g)
        |SELECT p.source, p.j, c.doc_id, c.w
        |FROM p JOIN c ON c.source = p.source
        |  AND p.pos >= c.cum AND p.pos < c.cum + c.w
        |ORDER BY p.source, p.j""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("w"))
        .withColumn("cum", coalesce(sum("w").over(w), lit(0L)))
        .withColumn("tw",
          sum("w").over(Window.partitionBy("source")))
      val p = c.select("source", "tw").distinct()
        .crossJoin(spark_j(s))
        .select(col("source"), col("j"),
          expr("((2 * j + 1) * tw) div 10").as("pos"))
      p.join(c, Seq("source"))
        .filter(col("pos") >= col("cum") && col("pos") < col("cum") + col("w"))
        .select(col("source"), col("j"), col("doc_id"), col("w"))
        .orderBy("source", "j")
    },

    // Length-BUCKETED inference batching — the serving-side twin of
    // q143's training packing: batching variable-length sequences pads
    // every row to its batch's longest, so batch composition IS the
    // inference bill. Per source stream, two deterministic schemes over
    // the SAME BPE-priced frame: `naive` (arrival order, batches of 32,
    // pad to the batch max — the default everyone starts with) vs
    // `bucketed` (route each doc to the smallest power-of-two length
    // bucket that fits it, batch within (source, bucket), pad to the
    // bucket width). The per-batch padded-token and waste-ppm columns
    // are the table that justifies length bucketing. Integer-only
    // (counts, power-of-two widths, ppm by integer division) → hash-
    // exact. Scale shape: corpus-sized work is the materialized pricing
    // artifact read; both schemes are per-source (or per source×bucket)
    // windows — no global sort — and the output is batches-sized.
    // The bucket ladder runs to 2^31 — above any n_tok an INT-charred
    // document can price — so the smallest-fitting lookup can never
    // yield NULL (a NULL batch_key would ORDER BY NULLS FIRST on Spark
    // but NULLS LAST on DuckDB: a latent hash divergence).
    QueryDef(
      "q202_length_batching",
      TextOps.bpeLearnSql(TextOps.BpeMerges) + TextOps.bpeDocSql() +
        TextOps.bpePackSql +
        """,
          |n AS (SELECT source, doc_id, n_tok FROM o),
          |b AS (SELECT source, doc_id, n_tok,
          |    list_min(list_filter([16, 32, 64, 128, 256, 512, 1024,
          |      2048, 4096, 8192, 16384, 32768, 65536, 131072, 262144,
          |      524288, 1048576, 2097152, 4194304, 8388608, 16777216,
          |      33554432, 67108864, 134217728, 268435456, 536870912,
          |      1073741824, 2147483648],
          |      p -> p >= n_tok)) AS bucket
          |  FROM n),
          |br AS (SELECT source, bucket, n_tok, ROW_NUMBER() OVER (
          |    PARTITION BY source, bucket ORDER BY doc_id) AS rn
          |  FROM b),
          |bb AS (SELECT 'bucketed' AS scheme,
          |    source || ':b' || CAST(bucket AS VARCHAR) || '-'
          |      || CAST((rn - 1) // 32 AS VARCHAR) AS batch_key,
          |    count(*) AS n_seqs, sum(n_tok) AS sum_tok,
          |    count(*) * bucket AS padded_tok
          |  FROM br GROUP BY source, bucket, (rn - 1) // 32),
          |nr AS (SELECT source, n_tok, ROW_NUMBER() OVER (
          |    PARTITION BY source ORDER BY doc_id) AS rn FROM n),
          |nb AS (SELECT 'naive' AS scheme,
          |    source || ':n-' || CAST((rn - 1) // 32 AS VARCHAR)
          |      AS batch_key,
          |    count(*) AS n_seqs, sum(n_tok) AS sum_tok,
          |    count(*) * max(n_tok) AS padded_tok
          |  FROM nr GROUP BY source, (rn - 1) // 32),
          |u AS (SELECT * FROM bb UNION ALL SELECT * FROM nb)
          |SELECT scheme, batch_key, CAST(n_seqs AS BIGINT) AS n_seqs,
          |  CAST(sum_tok AS BIGINT) AS sum_tok,
          |  CAST(padded_tok AS BIGINT) AS padded_tok,
          |  CAST((padded_tok - sum_tok) * 1000000 // padded_tok
          |    AS BIGINT) AS waste_ppm
          |FROM u ORDER BY scheme, batch_key""".stripMargin) { (s, dir) =>
      val n = TextOps.bpePackOffsets(s, dir)
        .select("source", "doc_id", "n_tok")
      val powers = (4 to 31).map(1L << _)
      val b = n.withColumn("bucket", expr(
        s"array_min(filter(array(${powers.mkString(",")}), " +
          "p -> p >= n_tok))"))
      val bb = b
        .withColumn("rn", row_number().over(Window
          .partitionBy("source", "bucket").orderBy("doc_id")))
        .groupBy(col("source"), col("bucket"),
          expr("(rn - 1) div 32").as("g"))
        .agg(count(lit(1)).as("n_seqs"), sum("n_tok").as("sum_tok"))
        .select(lit("bucketed").as("scheme"),
          concat(col("source"), lit(":b"),
            col("bucket").cast("string"), lit("-"),
            col("g").cast("string")).as("batch_key"),
          col("n_seqs"), col("sum_tok"),
          (col("n_seqs") * col("bucket")).as("padded_tok"))
      val nb = n
        .withColumn("rn", row_number().over(Window
          .partitionBy("source").orderBy("doc_id")))
        .groupBy(col("source"), expr("(rn - 1) div 32").as("g"))
        .agg(count(lit(1)).as("n_seqs"), sum("n_tok").as("sum_tok"),
          max("n_tok").as("mx"))
        .select(lit("naive").as("scheme"),
          concat(col("source"), lit(":n-"), col("g").cast("string"))
            .as("batch_key"),
          col("n_seqs"), col("sum_tok"),
          (col("n_seqs") * col("mx")).as("padded_tok"))
      bb.union(nb)
        .select(col("scheme"), col("batch_key"), col("n_seqs"),
          col("sum_tok"), col("padded_tok"),
          expr("(padded_tok - sum_tok) * 1000000 div padded_tok")
            .as("waste_ppm"))
        .orderBy("scheme", "batch_key")
    },

    // Shard-assignment STABILITY audit: when the training-shard count
    // grows 16 → 17, what fraction of documents move? Two
    // content-addressed schemes over the same sha256 hash family:
    // `mod` (shard = h % N — the naive choice, which reshuffles
    // ~15/16 of the corpus on any resize, invalidating every cached
    // shard) vs `rendezvous` (highest-random-weight: shard =
    // argmax_s hash(doc, s) — only docs whose new shard 16 wins move,
    // ~1/17). The table that justifies HRW for loader-shard layout
    // before a resize ever happens. All hashing is the oracle-portable
    // sha256 family; mod parses a 6-hex window with the shared
    // ascii-arithmetic idiom; HRW's argmax compares full hex strings
    // (lexicographic == numeric at fixed width) via max_by/arg_max.
    QueryDef(
      "q174_shard_stability", {
        val hexWin = (0 until 6).map { i =>
          val p = math.pow(16, 5 - i).toLong
          s"CAST($p AS BIGINT) * (ascii(substr(h, ${i + 1}, 1)) - " +
            s"(CASE WHEN ascii(substr(h, ${i + 1}, 1)) >= 97 " +
            "THEN 87 ELSE 48 END))"
        }.mkString("(", " + ", ")")
        s"""WITH hm AS (SELECT doc_id,
           |    sha256('shard-v1|' || CAST(doc_id AS VARCHAR)) AS h
           |  FROM documents),
           |hv AS (SELECT doc_id, $hexWin AS v FROM hm),
           |mods AS (SELECT doc_id,
           |    CAST(v % 16 <> v % 17 AS INTEGER) AS moved FROM hv),
           |hw AS (SELECT d.doc_id, s.s,
           |    sha256('hrw-v1|' || CAST(d.doc_id AS VARCHAR) || '|'
           |      || CAST(s.s AS VARCHAR)) AS hs
           |  FROM documents d, (SELECT unnest(range(0, 17)) AS s) s),
           |hrw AS (SELECT doc_id,
           |    CAST(arg_max(CASE WHEN s < 16 THEN s END,
           |        CASE WHEN s < 16 THEN hs END)
           |      <> arg_max(s, hs) AS INTEGER) AS moved
           |  FROM hw GROUP BY doc_id),
           |u AS (SELECT 'mod' AS scheme, * FROM mods
           |  UNION ALL SELECT 'rendezvous', * FROM hrw)
           |SELECT scheme, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(moved) AS BIGINT) AS n_moved,
           |  floor(sum(moved) / CAST(count(*) AS DOUBLE) * 1000000)
           |    / 1000000.0 AS moved_frac
           |FROM u GROUP BY scheme ORDER BY scheme""".stripMargin
      }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val hv = docs.select(col("doc_id"),
        expr("conv(substr(sha2(concat('shard-v1|', " +
          "cast(doc_id as string)), 256), 1, 6), 16, 10)")
          .cast("long").as("v"))
      val mods = hv.select(col("doc_id"),
        (col("v") % 16 =!= col("v") % 17).cast("int").as("moved"))
      val hw = docs.select(col("doc_id"),
        explode(sequence(lit(0), lit(16))).as("s"))
        .select(col("doc_id"), col("s"),
          sha2(concat(lit("hrw-v1|"), col("doc_id").cast("string"),
            lit("|"), col("s").cast("string")), 256).as("hs"))
      val hrw = hw.groupBy("doc_id").agg(
        (max_by(when(col("s") < 16, col("s")),
          when(col("s") < 16, col("hs"))) =!= max_by(col("s"), col("hs")))
          .cast("int").as("moved"))
      mods.select(lit("mod").as("scheme"), col("doc_id"), col("moved"))
        .unionByName(hrw.select(lit("rendezvous").as("scheme"),
          col("doc_id"), col("moved")))
        .groupBy("scheme")
        .agg(count(lit(1)).as("n_docs"), sum("moved").as("n_moved"),
          (floor(sum("moved") / count(lit(1)).cast("double") * 1000000)
            / 1000000.0).as("moved_frac"))
        .orderBy("scheme")
    })

  /** The 0..4 systematic-position spine for q173. */
  private def spark_j(
      s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    (0L until 5L).toDF("j")
  }

  /** q113 build over arbitrary bench (b_id, b_text) / corpus (c_id,
    * c_text) frames: exact char-8-gram prefix prefilter + verbatim
    * instr() verification, lossless with NO length precondition.
    *
    * Main path (gram probes): if text A appears inside text B, A's
    * first 8 characters occur as one of B's char 8-grams — provided
    * len(A) >= 8. Both probes broadcast the BENCH side (prefixes for
    * one direction, the distinct gram set for the other); the corpus
    * side stays a row-local scan, which is what holds at 100 TB where
    * only the bench set is broadcast-sized.
    *
    * Fallback path (sub-8-char docs, where the prefix gram doesn't
    * exist): such docs pair directly — every (short bench doc ×
    * corpus doc) and (bench doc × short corpus doc) candidate goes
    * straight to verification. Both fallbacks are broadcast
    * nested-loop joins whose BROADCAST side is bench-derived (the
    * bench set, or its sub-8-char subset) and whose streamed side is
    * scanned once — linear in corpus size with a degenerate-set
    * constant, and exactly empty on any corpus without sub-8-char
    * documents (the driver's corpora guarantee >= 59 chars, so the
    * registered q113 plan's main path carries all the data;
    * PrefilterInvariantsSpec pins losslessness on a corpus that
    * violates the length assumption).
    */
  def substringDecontaminate(b: DataFrame, c: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(b.sparkSession)
    val bPref = b.filter(length(col("b_text")) >= 8)
      .select(col("b_id"), substring(col("b_text"), 1, 8).as("g"))
    val bGrams = b
      .select(col("b_id"), expr("char_ngrams(b_text, 8)"))
      .toDF("b_id", "pos", "g")
      .select("b_id", "g").distinct()
    val cand1 = c
      .select(col("c_id"), expr("char_ngrams(c_text, 8)"))
      .toDF("c_id", "pos", "g")
      .join(broadcast(bPref), "g")
      .select("b_id", "c_id")
    val cand2 = c.filter(length(col("c_text")) >= 8)
      .select(col("c_id"), substring(col("c_text"), 1, 8).as("g"))
      .join(broadcast(bGrams), "g")
      .select("b_id", "c_id")
    // sub-8-char fallbacks: a short bench doc may hide in ANY corpus
    // doc; a short corpus doc may hide in any bench doc. The bench-
    // short branch streams the whole corpus (c_id column), so it is
    // gated on a driver-side emptiness probe of the BENCH side — bench
    // sets are broadcast-small by the operator's contract, the probe is
    // one tiny job, and on any corpus honoring the 8-char floor it
    // deletes a corpus-wide pass from the plan entirely. The corpus-
    // short branch cannot be pre-gated without itself scanning c, so it
    // stays unconditional — its stream side is the length-filtered scan
    // the verification join reads anyway.
    val bShort = b.filter(length(col("b_text")) < 8).select("b_id")
    val candShortB =
      if (bShort.isEmpty) bShort.crossJoin(c.select("c_id").limit(0))
      else c.select("c_id").crossJoin(broadcast(bShort))
    val candShortC = c.filter(length(col("c_text")) < 8).select("c_id")
      .crossJoin(broadcast(b.select("b_id")))
      .select("b_id", "c_id")
    cand1.union(cand2)
      .union(candShortB.select("b_id", "c_id"))
      .union(candShortC).distinct()
      .join(broadcast(b), "b_id")
      .join(c, "c_id")
      .filter(expr("instr(c_text, b_text) > 0 or instr(b_text, c_text) > 0"))
      .select(col("b_id"), col("c_id"),
        expr("instr(c_text, b_text) > 0").as("b_in_c"),
        expr("instr(b_text, c_text) > 0").as("c_in_b"))
  }
}
