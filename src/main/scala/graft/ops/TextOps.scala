package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryDef
import graft.engine.{Materialize, Tables}
import graft.engine.Pin.Pinnable

/** Text-analysis operators for a training-data pipeline (builder brief:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting) over the `documents` table.
  *
  * All are pure column expressions (codegen'd higher-order functions; no
  * UDFs), so they scale linearly with no shuffle except the grouped
  * rollups — the per-document ops are embarrassingly parallel at 100 TB.
  *
  * Determinism: integer/string results are exact; ratios are computed as
  * double divisions of exact integers (IEEE-identical in DuckDB).
  */
object TextOps {

  private val words = "split(text, ' ')"

  /** Merges the registered BPE queries learn. 12 is enough to reach
    * multi-character merge chains (rank 8 merges a rank-7 output at
    * sf0.001) while keeping the unrolled oracle text bounded.
    */
  private[ops] val BpeMerges = 12

  /** The delimited word encoding both engines fold merges over: tokens
    * joined by TWO spaces, one space at each end (`" a  b  c "`). A merge
    * (l, r) is then `replace(enc, " l  r ", " lr ")` — and because
    * consecutive matches SHARE a boundary space under this scheme, the
    * left-to-right non-overlapping scan both Spark's and DuckDB's
    * `replace` implement is exactly the greedy adjacent-pair merge (a
    * single-space join would let the first match consume the delimiter
    * the next match needs: " a b a b " merges once, not twice).
    */
  private val enc0 = "concat(' ', array_join(transform(" +
    "sequence(1, length(wd)), i -> substr(wd, i, 1)), '  '), ' ')"

  /** Winnowing frame over a (doc_id, text) corpus: one row per char
    * 5-gram with its polynomial hash `h` and the window minimum `mh`
    * over a ±5 radius — a gram is a selected fingerprint iff h == mh.
    * Shared by q95 and the guarantee spec (DedupQualitySpec: documents
    * sharing a long-enough substring share a selected fingerprint).
    */
  def winnowed(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val terms = (0 until 5).map(j =>
      s"CAST(${math.pow(131, 4 - j).toLong} AS BIGINT) * " +
        s"ascii(substr(t, ${j + 1}, 1))").mkString(" + ")
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-5, 5)
    docs
      .select(col("doc_id"), expr("char_ngrams(text, 5)"))
      .toDF("doc_id", "pos", "t")
      .select(col("doc_id"), col("pos"),
        expr(s"($terms) % 1000000007").as("h"))
      .withColumn("mh", min(col("h")).over(w))
  }

  val defs: Seq[QueryDef] = Seq(

    // Per-document quality stats: lengths, tokens, stopword ratio, score.
    QueryDef(
      "q30_text_stats",
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars_c,
        |  CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(replace(text,' ','')) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS INTEGER) AS avg_word_len,
        |  CAST(len(list_filter(string_split(text,' '),
        |       w -> w IN ('the','a'))) AS INTEGER) AS stop_hits,
        |  CAST(len(list_filter(string_split(text,' '),
        |       w -> w IN ('the','a'))) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS INTEGER) AS stop_ratio,
        |  least(1.0, CAST(len(string_split(text,' ')) AS INTEGER) / 100.0)
        |    * (1.0 - CAST(len(list_filter(string_split(text,' '),
        |         w -> w IN ('the','a'))) AS DOUBLE)
        |       / CAST(len(string_split(text,' ')) AS INTEGER)) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_c"),
        expr(s"size($words)").as("n_tokens"),
        expr(s"cast(length(replace(text,' ','')) as double) / size($words)")
          .as("avg_word_len"),
        expr(s"size(filter($words, w -> w in ('the','a')))").as("stop_hits"),
        expr(s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
          s" / size($words)").as("stop_ratio"),
        expr(s"least(1.0, size($words) / 100.0) * (1.0 - " +
          s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
          s" / size($words))").as("quality"))
        .orderBy("doc_id")
    },

    // Corpus rollup by language tag.
    QueryDef(
      "q31_lang_rollup",
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CAST(len(string_split(text,' ')) AS BIGINT)) AS BIGINT)
        |    AS total_tokens,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(expr(s"cast(size($words) as bigint)")).cast("long")
            .as("total_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    },

    // Token counting: regex word tokens + a BPE-ish subword-unit estimate
    // (ceil(len/4) units per word), both as codegen'd HOFs.
    QueryDef(
      "q32_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER)
        |    AS alpha_tokens,
        |  CAST(list_sum(list_transform(string_split(text,' '),
        |       w -> (length(w)+3)//4)) AS BIGINT) AS bpe_units
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("alpha_tokens"),
        expr(s"aggregate($words, cast(0 as bigint), " +
          "(acc, w) -> acc + (length(w)+3) div 4)").as("bpe_units"))
        .orderBy("doc_id")
    },

    // Document fingerprint: hash of the sorted distinct word bag.
    QueryDef(
      "q33_fingerprint",
      """SELECT doc_id,
        |  sha256(array_to_string(list_sort(list_distinct(
        |    string_split(text,' '))), ' ')) AS fp,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INTEGER)
        |    AS n_distinct_words
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        expr(s"sha2(array_join(array_sort(array_distinct($words)), ' '), 256)")
          .as("fp"),
        expr(s"size(array_distinct($words))").as("n_distinct_words"))
        .orderBy("doc_id")
    },

    // Polynomial rolling-hash document fingerprint (Rabin-Karp family):
    // left fold over words, modular accumulator. The accumulator crosses
    // the fold as a string because DuckDB's list_reduce requires
    // accumulator type = element type; arithmetic is BIGINT mod 1e9+7 in
    // both engines, so results are exact.
    QueryDef(
      "q35_rolling_fingerprint",
      """SELECT doc_id,
        |  CAST(list_reduce(list_prepend('0', string_split(text, ' ')),
        |    (acc, w) -> CAST((CAST(acc AS BIGINT) * 131
        |      + ord(substr(w, 1, 1)) * 7 + length(w)) % 1000000007
        |      AS VARCHAR)) AS BIGINT) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        expr(s"cast(aggregate($words, '0', (acc, w) -> " +
          "cast((cast(acc as bigint) * 131 + ascii(substr(w, 1, 1)) * 7 " +
          "+ length(w)) % 1000000007 as string)) as bigint)").as("fp"))
        .orderBy("doc_id")
    },

    // Frequent n-grams (heavy hitters): top word-3-grams by DOCUMENT
    // frequency — the boilerplate / template detector of a training-data
    // pipeline (a shingle appearing in many distinct documents is
    // header/footer/license text to strip before dedup). The shingle
    // STRINGS come from the row-local ShingleStrings generator (the HOF
    // `transform(sequence(...))` formulation measured 3.7 s at sf0.1 from
    // interpreted lambdas — PERF.md finding #2); COUNT(DISTINCT doc_id)
    // makes within-doc repeats irrelevant, so no distinct pre-pass. Ties
    // broken by the shingle string for a total order.
    QueryDef(
      "q65_frequent_ngrams",
      """WITH s AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3)
        |SELECT sh, COUNT(DISTINCT doc_id) AS df FROM s
        |GROUP BY sh ORDER BY df DESC, sh LIMIT 100""".stripMargin) {
      (s, dir) =>
      // served from the materialized 3-shingle document-frequency
      // index ([[CurationOps.shingle3Df]]): the per-invocation cost is
      // a top-100 selection over the vocabulary-sized artifact, not a
      // corpus re-shingle + two-exchange distinct aggregation — at
      // 100 TB the boilerplate index is built once per corpus version
      // and every heavy-hitter read serves from it (guide §1.2/§6).
      CurationOps.shingle3Df(s, dir)
        .orderBy(col("df").desc, col("sh"))
        .limit(100)
    },

    // N-gram-heuristic language ID via stopword hit counts.
    QueryDef(
      "q34_lang_id",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '),
        |       w -> w IN ('the','a','of'))) AS INTEGER) AS en_hits,
        |  CAST(len(list_filter(string_split(text,' '),
        |       w -> w IN ('der','die','das'))) AS INTEGER) AS de_hits,
        |  CASE WHEN len(list_filter(string_split(text,' '),
        |              w -> w IN ('the','a','of'))) >= 1
        |            AND len(list_filter(string_split(text,' '),
        |              w -> w IN ('the','a','of')))
        |             >= len(list_filter(string_split(text,' '),
        |              w -> w IN ('der','die','das'))) THEN 'en'
        |       WHEN len(list_filter(string_split(text,' '),
        |              w -> w IN ('der','die','das'))) >= 1 THEN 'de'
        |       ELSE 'und' END AS pred_lang
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val en = s"size(filter($words, w -> w in ('the','a','of')))"
      val de = s"size(filter($words, w -> w in ('der','die','das')))"
      Tables(s, dir, "documents").select(
        col("doc_id"),
        expr(en).as("en_hits"),
        expr(de).as("de_hits"),
        expr(s"case when $en >= 1 and $en >= $de then 'en' " +
          s"when $de >= 1 then 'de' else 'und' end").as("pred_lang"))
        .orderBy("doc_id")
    },

    // Confusion audit of the q34 language-ID heuristic against the
    // corpus's `lang` column as ground truth: per label (union of truth
    // and predicted values), true/false positives, false negatives, and
    // precision/recall. This is the acceptance metric for a heuristic
    // classifier — q34's oracle pins WHAT it predicts; this pins HOW
    // WELL, in the same artifact. Label side is tiny → broadcast; one
    // pass over the corpus.
    QueryDef(
      "q79_lang_confusion", {
        val en = "len(list_filter(string_split(text,' '), " +
          "w -> w IN ('the','a','of')))"
        val de = "len(list_filter(string_split(text,' '), " +
          "w -> w IN ('der','die','das')))"
        s"""WITH p AS (SELECT lang,
           |    CASE WHEN $en >= 1 AND $en >= $de THEN 'en'
           |         WHEN $de >= 1 THEN 'de' ELSE 'und' END AS pred
           |  FROM documents),
           |l AS (SELECT DISTINCT lang AS label FROM p
           |      UNION SELECT DISTINCT pred FROM p)
           |SELECT label,
           |  CAST(SUM(CASE WHEN lang = label AND pred = label
           |    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |  CAST(SUM(CASE WHEN pred = label AND lang <> label
           |    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |  CAST(SUM(CASE WHEN lang = label AND pred <> label
           |    THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           |  CASE WHEN SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) = 0
           |    THEN NULL ELSE
           |      CAST(SUM(CASE WHEN lang = label AND pred = label
           |        THEN 1 ELSE 0 END) AS DOUBLE)
           |      / SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) END AS prec,
           |  CASE WHEN SUM(CASE WHEN lang = label THEN 1 ELSE 0 END) = 0
           |    THEN NULL ELSE
           |      CAST(SUM(CASE WHEN lang = label AND pred = label
           |        THEN 1 ELSE 0 END) AS DOUBLE)
           |      / SUM(CASE WHEN lang = label THEN 1 ELSE 0 END) END AS rec
           |FROM l CROSS JOIN p GROUP BY label ORDER BY label""".stripMargin
      }) { (s, dir) =>
      val en = s"size(filter($words, w -> w in ('the','a','of')))"
      val de = s"size(filter($words, w -> w in ('der','die','das')))"
      // the (lang, pred) projection has three consumers (two label
      // distincts + the confusion join); the explicit repartition
      // inserts one tiny exchange that ReuseExchange shares across all
      // three, so the corpus — and the interpreted stopword-filter
      // lambdas — are scanned once, not three times
      val p = Tables(s, dir, "documents").select(col("lang"),
        expr(s"case when $en >= 1 and $en >= $de then 'en' " +
          s"when $de >= 1 then 'de' else 'und' end").as("pred"))
        .repartition(col("lang"), col("pred"))
      val labels = p.select(col("lang").as("label"))
        .union(p.select(col("pred").as("label"))).distinct()
      def hits(c: Column) = sum(when(c, 1).otherwise(0))
      p.crossJoin(broadcast(labels))
        .groupBy("label")
        .agg(
          hits(col("lang") === col("label") && col("pred") === col("label"))
            .cast("long").as("tp"),
          hits(col("pred") === col("label") && col("lang") =!= col("label"))
            .cast("long").as("fp"),
          hits(col("lang") === col("label") && col("pred") =!= col("label"))
            .cast("long").as("fn"),
          when(hits(col("pred") === col("label")) === 0, lit(null))
            .otherwise(
              hits(col("lang") === col("label") && col("pred") === col("label"))
                .cast("double") / hits(col("pred") === col("label")))
            .as("prec"),
          when(hits(col("lang") === col("label")) === 0, lit(null))
            .otherwise(
              hits(col("lang") === col("label") && col("pred") === col("label"))
                .cast("double") / hits(col("lang") === col("label")))
            .as("rec"))
        .orderBy("label")
    },

    // Document chunking — the segmentation step of an embedding pipeline
    // (size-50 token windows, stride 40, 10-token overlap). Generator
    // shape: one sequence-explode per document, output size governed by
    // the stride parameters, chunk text pinned by hash rather than
    // shipped. Row-local (no shuffle): at 100 TB chunking fuses into the
    // scan that feeds the embedding model.
    QueryDef(
      "q90_doc_chunking",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS t,
        |    len(string_split(text,' ')) AS n FROM documents),
        |c AS (SELECT doc_id, t, n,
        |    (greatest(n - 50, 0) + 39) // 40 + 1 AS n_chunks FROM t),
        |x AS (SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS i FROM c)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |  CAST(i * 40 + 1 AS INTEGER) AS start_tok,
        |  CAST(least(50, n - i * 40) AS INTEGER) AS n_tok,
        |  sha256(array_to_string(
        |    t[(i*40+1):(i*40+least(50, n - i*40))], ' ')) AS chunk_sha
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr(words).as("t"))
        .withColumn("n", size(col("t")))
        .withColumn("i",
          explode(expr("sequence(0, (greatest(n - 50, 0) + 39) div 40)")))
        .select(col("doc_id"), col("i").cast("int").as("chunk_idx"),
          (col("i") * 40 + 1).cast("int").as("start_tok"),
          expr("cast(least(50, n - i * 40) as int)").as("n_tok"),
          expr("sha2(array_join(slice(t, i * 40 + 1, " +
            "least(50, n - i * 40)), ' '), 256)").as("chunk_sha"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Winnowing fingerprints (the MOSS family): hash every char 5-gram
    // (portable polynomial — identical integer arithmetic in both
    // engines), then select the positions whose hash is the minimum
    // within a ±5 radius. Guarantee: any two documents sharing a
    // sufficiently long substring share a selected fingerprint — the
    // local-sampling property exact-hash and MinHash fingerprints lack —
    // at ~10% of the n-gram volume. Ships per-doc fingerprint-set hash
    // (the set itself is the index payload in production). One generator
    // pass + one per-doc window; the only shuffle is the per-doc
    // partition.
    QueryDef(
      "q95_winnowing", {
        val terms = (0 until 5).map(j =>
          s"CAST(${math.pow(131, 4 - j).toLong} AS BIGINT) * " +
            s"ascii(substr(t, ${j + 1}, 1))").mkString(" + ")
        s"""WITH p AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 5)
           |    AS t, CAST(i AS INTEGER) AS pos
           |  FROM documents, LATERAL unnest(range(1, length(text) - 3))
           |    AS u(i)
           |  WHERE length(text) >= 5),
           |g AS (SELECT doc_id, pos, ($terms) % 1000000007 AS h FROM p),
           |m AS (SELECT doc_id, pos, h, min(h) OVER (PARTITION BY doc_id
           |    ORDER BY pos ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
           |    AS mh FROM g)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           |  CAST(SUM(CASE WHEN h = mh THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_selected,
           |  sha256(array_to_string(list_sort(list(DISTINCT h)
           |    FILTER (h = mh)), ',')) AS fp_sha
           |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      winnowed(Tables(s, dir, "documents"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("h") === col("mh"), 1L).otherwise(0L))
            .as("n_selected"),
          sha2(array_join(sort_array(collect_set(
            when(col("h") === col("mh"), col("h")))), ","), 256)
            .as("fp_sha"))
        .orderBy("doc_id")
    },

    // Word-repetition quality signals (the Gopher-style repetition
    // filters): duplicate-word fraction and most-frequent-word fraction
    // per document. Plan shape: explode → ONE (doc_id, word) hash
    // aggregate with map-side partial counts (the corpus-sized shuffle
    // moves one row per distinct (doc, word), not per token), then a
    // skinny per-doc re-aggregate. No per-doc O(n²) HOF scan.
    QueryDef(
      "q72_word_repetition",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |f AS (SELECT doc_id, word, count(*) AS c FROM w
        |  WHERE word <> '' GROUP BY doc_id, word)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  CAST(count(*) AS INTEGER) AS n_distinct,
        |  round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_ratio,
        |  round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_frac
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr(words)).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n_words"),
          count(lit(1)).cast("int").as("n_distinct"),
          round(lit(1.0) - count(lit(1)) / sum("c").cast("double"), 6)
            .as("dup_ratio"),
          round(max("c") / sum("c").cast("double"), 6).as("top_frac"))
        .orderBy("doc_id")
    },

    // BPE merge step — one iteration of byte-pair-encoding vocabulary
    // learning (the Sennrich scheme every modern tokenizer trains
    // with): count adjacent symbol pairs across the corpus, weighted by
    // word frequency; the top pair is the next merge. The q55 "training
    // step" convention: one deterministic iteration on the query
    // surface (the driver loop around it is trivial). Plan shape is the
    // classic BPE trick — aggregate the corpus to its DISTINCT-word
    // vocabulary FIRST (one token-stream pass; the vocab is Heaps'-law
    // sublinear in corpus size), then explode pair positions over vocab
    // entries only. At 100 TB the pair counting touches the vocabulary,
    // never the corpus. All-integer output — no float boundary at all.
    QueryDef(
      "q112_bpe_merge_step",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS wd
        |  FROM documents),
        |v AS (SELECT wd, count(*) AS freq FROM w WHERE wd <> ''
        |  GROUP BY wd),
        |pr AS (SELECT substr(wd, CAST(i AS INTEGER), 1) AS p1,
        |    substr(wd, CAST(i AS INTEGER) + 1, 1) AS p2, freq
        |  FROM v, LATERAL unnest(range(1, length(wd))) AS u(i)
        |  WHERE length(wd) >= 2),
        |agg AS (SELECT p1, p2, CAST(sum(freq) AS BIGINT) AS pair_n
        |  FROM pr GROUP BY 1, 2)
        |SELECT p1, p2, pair_n, CAST(ROW_NUMBER() OVER (
        |    ORDER BY pair_n DESC, p1, p2) AS INTEGER) AS rn
        |FROM agg ORDER BY rn LIMIT 10""".stripMargin) { (s, dir) =>
      val vocab = Tables(s, dir, "documents")
        .select(explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("wd").agg(count(lit(1)).as("freq"))
      val w = Window.orderBy(col("pair_n").desc, col("p1"), col("p2"))
      vocab.filter(length(col("wd")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(wd) - 1), " +
            "i -> struct(substr(wd, i, 1) as p1, " +
            "substr(wd, i + 1, 1) as p2))")).as("p"), col("freq"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum("freq").as("pair_n"))
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter(col("rn") <= 10)
        .orderBy("rn")
    },

    // Full BPE vocabulary learning — the driver loop q112 deliberately
    // left out, run to completion: N merges learned iteratively over the
    // DISTINCT-word vocabulary (the Sennrich scheme). Each iteration is
    // one vocabulary-sized pair aggregate (Heaps'-law sublinear in corpus
    // size) + a row-local `replace` apply; the corpus itself is scanned
    // exactly once, to build the initial (word, freq) table. The learned
    // merge table is a Materialize artifact — downstream encoding queries
    // (q140/q141) reuse it without re-learning. Oracle: the same N
    // iterations UNROLLED into chained CTEs (argmax per stage can't be a
    // recursive CTE — aggregation in the recursive term), with the
    // single-pass greedy apply expressed as the SAME left-to-right
    // non-overlapping string `replace` both engines implement.
    QueryDef("q139_bpe_learn", bpeLearnSql(BpeMerges) +
      s""",
         |merges AS (${(1 to BpeMerges)
        .map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ")})
         |SELECT CAST(merge_rank AS INTEGER) AS merge_rank, lhs, rhs,
         |  lhs || rhs AS merged, CAST(pair_n AS BIGINT) AS pair_n
         |FROM merges ORDER BY merge_rank""".stripMargin) { (s, dir) =>
      bpeMerges(s, dir).orderBy("merge_rank")
    },

    // BPE corpus encoding with the learned merges: per-document token
    // counts under the q139 vocabulary — the "token counting" the brief
    // asks for, at tokenizer strength rather than whitespace strength.
    // Plan shape: docs aggregate to DISTINCT (doc, word) with counts
    // (map-side combine moves one row per distinct pair, not per token),
    // then ONE word-keyed join against the materialized encoded
    // vocabulary (the word-cache trick every production tokenizer uses —
    // AQE broadcasts it when it fits), then a skinny per-doc re-agg. No
    // merge rules are ever applied at corpus scale: the vocabulary
    // artifact already carries each word's final token count.
    QueryDef("q140_bpe_encode", bpeLearnSql(BpeMerges) + bpeDocSql() +
      s"""
         |SELECT a.doc_id, a.n_words, a.n_bpe_tokens,
         |  round(d.n_chars / CAST(a.n_bpe_tokens AS DOUBLE), 6)
         |    AS chars_per_tok
         |FROM agg a JOIN documents d USING (doc_id)
         |ORDER BY a.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      bpeDocTokens(s, dir)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          round(col("n_chars") / col("n_bpe_tokens").cast("double"), 6)
            .as("chars_per_tok"))
        .orderBy("doc_id")
    },

    // Tokenizer fertility per language — the tokens-per-word ratio
    // tokenizer papers report per language to expose vocabulary bias
    // (a vocab learned on one language fragments the others into more
    // tokens). Same plan as q140 up to the per-doc frame, then one
    // language rollup; shares the q139/q140 vocabulary artifact.
    QueryDef("q141_tokenizer_fertility", bpeLearnSql(BpeMerges) +
      bpeDocSql() +
      s"""
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(a.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(a.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
         |  round(sum(a.n_bpe_tokens) / CAST(sum(a.n_words) AS DOUBLE), 6)
         |    AS fertility
         |FROM agg a JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      bpeDocTokens(s, dir)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("n_words"),
          sum("n_bpe_tokens").as("n_bpe_tokens"),
          round(sum("n_bpe_tokens") / sum("n_words").cast("double"), 6)
            .as("fertility"))
        .orderBy("lang")
    },

    // Tokenizer staleness — the incremental-ingest question q133 asks
    // for dedup, asked for the tokenizer: when a new batch (here:
    // source src19) arrives, how much worse does YESTERDAY'S vocabulary
    // (learned with the batch held out) price it than a refreshed one?
    // tokens_stale encodes the batch by REPLAYING the held-out merge
    // rules over the batch's distinct words (novel words can't be in
    // any word cache — replay is the only correct path); tokens_fresh
    // reads the full-corpus word cache. The inflation ratio is the
    // retrain-trigger metric a tokenizer-ops job alerts on. Oracle: TWO
    // unrolled learn chains in one statement (full + suffixed held-out)
    // plus a `WITH RECURSIVE` rank-join that replays the held-out
    // merges — recursion works for APPLY (one rule per step, no
    // aggregation), exactly where learning can't.
    QueryDef("q149_tokenizer_staleness",
      "WITH RECURSIVE " + bpeLearnChain(BpeMerges, "", "") + ",\n" +
        bpeLearnChain(BpeMerges, "r", " WHERE source <> 'src19'") +
      s""",
         |mergesr AS (${(1 to BpeMerges)
        .map(k => s"SELECT * FROM m${k}r").mkString(" UNION ALL ")}),
         |dwb AS (SELECT doc_id, wd, count(*) AS c FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS wd
         |    FROM documents WHERE source = 'src19') t
         |  WHERE wd <> '' GROUP BY doc_id, wd),
         |vb0 AS (SELECT wd, concat(' ', array_to_string(
         |    list_transform(range(1, length(wd) + 1),
         |      i -> substr(wd, CAST(i AS INTEGER), 1)), '  '), ' ')
         |    AS enc
         |  FROM (SELECT DISTINCT wd FROM dwb) dws),
         |ra AS (SELECT wd, enc, 0 AS k FROM vb0
         |  UNION ALL
         |  SELECT a.wd, replace(a.enc,
         |      ' ' || m.lhs || '  ' || m.rhs || ' ',
         |      ' ' || m.lhs || m.rhs || ' '), a.k + 1
         |  FROM ra a JOIN mergesr m ON m.merge_rank = a.k + 1),
         |tokr AS (SELECT wd, len(string_split(trim(enc), '  ')) AS n_tok
         |  FROM ra WHERE k = $BpeMerges),
         |tokf AS (SELECT wd, len(string_split(trim(enc), '  ')) AS n_tok
         |  FROM v$BpeMerges),
         |agg AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |    CAST(sum(c) AS BIGINT) AS n_words FROM dwb),
         |st AS (SELECT CAST(sum(c * n_tok) AS BIGINT) AS toks
         |  FROM dwb JOIN tokr USING (wd)),
         |fr AS (SELECT CAST(sum(c * n_tok) AS BIGINT) AS toks
         |  FROM dwb JOIN tokf USING (wd))
         |SELECT 'src19' AS batch_source, agg.n_docs, agg.n_words,
         |  st.toks AS tokens_stale, fr.toks AS tokens_fresh,
         |  floor(st.toks / CAST(fr.toks AS DOUBLE) * 1000000)
         |    / 1000000.0 AS inflation
         |FROM agg, st, fr""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val restPairs = pairsOf(bpeMergesWhere(s, dir, "rest",
        "source <> 'src19'"))
      val dwb = docs.filter(col("source") === "src19")
        .select(col("doc_id"), explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("doc_id", "wd").agg(count(lit(1)).as("c"))
        .pinned
      val staleEnc = applyMerges(expr(enc0), restPairs)
      val tokr = dwb.select("wd").distinct()
        .select(col("wd"), staleEnc.as("enc"))
        .select(col("wd"), size(expr("split(trim(enc), '  ')"))
          .as("n_tok"))
      val tokf = bpeVocab(s, dir).select(col("wd"), col("n_tok"))
      val agg = dwb.agg(countDistinct(col("doc_id")).as("n_docs"),
        sum("c").as("n_words"))
      val st = dwb.join(tokr, "wd")
        .agg(sum(col("c") * col("n_tok")).as("tokens_stale"))
      val fr = dwb.join(tokf, "wd")
        .agg(sum(col("c") * col("n_tok")).as("tokens_fresh"))
      agg.crossJoin(st).crossJoin(fr)
        .select(lit("src19").as("batch_source"), col("n_docs"),
          col("n_words"), col("tokens_stale"), col("tokens_fresh"),
          (floor(col("tokens_stale")
            / col("tokens_fresh").cast("double") * 1000000) / 1000000.0)
            .as("inflation"))
    },

    // Exact heavy hitters at scale — the two-pass Misra-Gries shape:
    // pass 1 folds the token stream into a capacity-bounded candidate
    // sketch (`mg_sketch`, a custom TypedImperativeAggregate whose
    // partial buffers merge associatively — the only thing shuffled is
    // one <=128-entry summary per partition, NEVER the Heaps-law-wide
    // (word, count) key space); pass 2 recounts ONLY candidates exactly
    // (broadcast semi-join keeps the groupBy key space <=capacity) and
    // applies the threshold. Output is deterministic and provably
    // complete for any threshold phi >= 1/(capacity+1): every word with
    // freq > N/(cap+1) survives the sketch. phi = 1/100, capacity 128.
    // The synthetic corpus's 31-word vocabulary never fills the buffer —
    // the decrement/merge machinery is exercised adversarially in
    // HeavyHitterSpec (50k-key Zipf stream, capacity 64); the oracle
    // pins the composed two-pass result == the naive full aggregate.
    QueryDef(
      "q159_heavy_hitters",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS wd
        |  FROM documents),
        |f AS (SELECT wd, CAST(count(*) AS BIGINT) AS n FROM w
        |  WHERE wd <> '' GROUP BY wd),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM f)
        |SELECT wd, n FROM f, t WHERE n * 100 > total
        |ORDER BY n DESC, wd""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val wds = Tables(s, dir, "documents")
        .select(explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
      val cand = wds.agg(expr("mg_sketch(wd, 128)").as("c"))
        .select(explode(col("c")).as("wd"))
      val total = wds.agg(count(lit(1)).as("total"))
      wds.join(broadcast(cand), "wd")
        .groupBy("wd").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .filter(col("n") * 100 > col("total"))
        .select(col("wd"), col("n"))
        .orderBy(col("n").desc, col("wd"))
    },

    // Vocabulary-growth (Heaps-law) curve: the corpus in ingestion order
    // (doc_id), cut into 10 id-range deciles — per decile, docs,
    // cumulative tokens, NEW distinct words, and cumulative vocabulary.
    // The curve a curator reads to project vocabulary/OOV growth before
    // committing a tokenizer budget: a healthy corpus flattens
    // (sublinear V ~ K·nᵝ); a template farm goes flat immediately, a
    // crawl of unclean unique junk stays linear. Exactness: every output
    // is an INTEGER count — first occurrence per word = min decile
    // (deciles are id-ordered, so min decile IS the first-containing
    // decile); no floats anywhere. Scale shape: the decile is row-local
    // integer arithmetic against a broadcast 1-row id-bounds frame — an
    // `ntile` would be a single-partition global sort of the corpus —
    // then one (word → min decile) aggregate (map-side combined) + one
    // per-decile token count; the running sums run on 10 rows.
    QueryDef(
      "q165_heaps_curve",
      """WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
        |  FROM documents),
        |dd AS (SELECT doc_id, text,
        |    1 + ((doc_id - b.mn) * 10) // (b.mx - b.mn + 1) AS dec
        |  FROM documents, b),
        |w AS (SELECT dec, unnest(string_split(text, ' ')) AS wd FROM dd),
        |wf AS (SELECT dec, wd FROM w WHERE wd <> ''),
        |tok AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_tok
        |  FROM wf GROUP BY dec),
        |fo AS (SELECT wd, min(dec) AS dec FROM wf GROUP BY wd),
        |nw AS (SELECT dec, CAST(count(*) AS BIGINT) AS new_words
        |  FROM fo GROUP BY dec),
        |nd AS (SELECT dec, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM dd GROUP BY dec)
        |SELECT nd.dec AS decile, nd.n_docs,
        |  CAST(SUM(tok.n_tok) OVER (ORDER BY nd.dec) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(COALESCE(nw.new_words, 0) AS BIGINT) AS new_words,
        |  CAST(SUM(COALESCE(nw.new_words, 0)) OVER (ORDER BY nd.dec)
        |    AS BIGINT) AS cum_vocab
        |FROM nd JOIN tok ON tok.dec = nd.dec
        |LEFT JOIN nw ON nw.dec = nd.dec
        |ORDER BY decile""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val b = docs.agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      val dd = docs.crossJoin(broadcast(b))
        .select(col("doc_id"), col("text"),
          (lit(1) + expr("((doc_id - mn) * 10) div (mx - mn + 1)"))
            .as("dec"))
      val wf = dd.select(col("dec"), explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
      val tok = wf.groupBy("dec").agg(count(lit(1)).as("n_tok"))
      val nw = wf.groupBy("wd").agg(min("dec").as("dec"))
        .groupBy("dec").agg(count(lit(1)).as("new_words"))
      val nd = dd.groupBy("dec").agg(count(lit(1)).as("n_docs"))
      val wc = Window.orderBy("dec")
      nd.join(tok, "dec")
        .join(nw, Seq("dec"), "left")
        .select(col("dec").as("decile"), col("n_docs"),
          sum("n_tok").over(wc).as("cum_tokens"),
          coalesce(col("new_words"), lit(0L)).as("new_words"),
          sum(coalesce(col("new_words"), lit(0L))).over(wc)
            .as("cum_vocab"))
        .orderBy("decile")
    })

  /** Unrolled DuckDB oracle prefix: w0/v0 (vocab + initial encoding),
    * then per merge k: pair counts pK over v(k-1), argmax mK
    * (count desc, pair asc — binary string order in both engines), apply
    * vK. `MATERIALIZED` pins each stage evaluated once: v(k) is
    * referenced twice (p(k+1) and v(k+1)), and inlining would blow up
    * 2^N.
    */
  private[ops] def bpeLearnSql(n: Int): String =
    "WITH " + bpeLearnChain(n, "", "")

  /** The chain body with every CTE name suffixed (so two independent
    * vocabularies — e.g. full-corpus and batch-held-out — can unroll in
    * ONE statement) and an optional WHERE over `documents` restricting
    * the training corpus. Caller supplies the `WITH `/`WITH RECURSIVE `
    * prefix.
    */
  private[ops] def bpeLearnChain(n: Int, sfx: String,
      where: String): String = {
    val sb = new StringBuilder(
      s"""w0$sfx AS (SELECT wd, count(*) AS freq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS wd
         |    FROM documents$where) t
         |  WHERE wd <> '' GROUP BY wd),
         |v0$sfx AS MATERIALIZED (SELECT wd, concat(' ', array_to_string(
         |    list_transform(range(1, length(wd) + 1),
         |      i -> substr(wd, CAST(i AS INTEGER), 1)), '  '), ' ') AS enc,
         |    freq
         |  FROM w0$sfx)""".stripMargin)
    for (k <- 1 to n) sb ++=
      s""",
         |p$k$sfx AS (SELECT t[CAST(i AS INTEGER)] AS lhs,
         |    t[CAST(i AS INTEGER) + 1] AS rhs, sum(freq) AS pair_n
         |  FROM (SELECT string_split(trim(enc), '  ') AS t, freq
         |    FROM v${k - 1}$sfx) s,
         |    LATERAL unnest(range(1, len(t))) AS u(i)
         |  GROUP BY 1, 2),
         |m$k$sfx AS (SELECT $k AS merge_rank, lhs, rhs, pair_n FROM p$k$sfx
         |  ORDER BY pair_n DESC, lhs, rhs LIMIT 1),
         |v$k$sfx AS MATERIALIZED (SELECT wd, replace(enc,
         |    ' ' || m.lhs || '  ' || m.rhs || ' ',
         |    ' ' || m.lhs || m.rhs || ' ') AS enc, freq
         |  FROM v${k - 1}$sfx, m$k$sfx m)""".stripMargin
    sb.toString
  }

  /** Learned BPE merge table `(merge_rank, lhs, rhs, merged, pair_n)` as
    * a Materialize artifact: built once per (corpus, version), reused by
    * q139-q141 and any session sharing the artifact store.
    *
    * The loop is the distributed-BPE-trainer shape: the corpus is read
    * ONCE into the distinct-word vocabulary, then each of the N
    * iterations runs one pair aggregate over that vocabulary (never the
    * corpus) and collects a single argmax row to the driver — the only
    * driver-side data is the N merge rules themselves. `localCheckpoint`
    * after each apply keeps the lineage flat (the q49 CC-loop
    * discipline); superseded blocks are released by the ContextCleaner.
    * Single-pass-per-rule greedy application, in learned order — exactly
    * the `replace` semantics, portable to any engine (documented on
    * [[enc0]]).
    */
  def bpeMerges(s: SparkSession, dir: String,
      n: Int = BpeMerges): DataFrame =
    Materialize.table(s, s"bpe_merges_$n", dir) {
      learnMerges(s, Tables(s, dir, "documents"), n)
    }

  /** Merge table learned on a RESTRICTED corpus (`whereSql` over
    * `documents`), materialized under its own `tag` — the held-out /
    * previous-day vocabulary the staleness audit (q149) compares
    * against.
    */
  def bpeMergesWhere(s: SparkSession, dir: String, tag: String,
      whereSql: String, n: Int = BpeMerges): DataFrame = {
    // The filter is part of the artifact's IDENTITY: hash it into the
    // name so two callers sharing a tag but not a predicate can never
    // serve each other's (stale) vocabulary.
    val fh = java.security.MessageDigest.getInstance("SHA-256")
      .digest(whereSql.getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString
    Materialize.table(s, s"bpe_merges_${n}_$tag-$fh", dir) {
      learnMerges(s, Tables(s, dir, "documents").filter(whereSql), n)
    }
  }

  private def learnMerges(s: SparkSession, docs: DataFrame,
      n: Int): DataFrame = {
    locally {
      import s.implicits._
      var vocab = docs
        .select(explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("wd").agg(count(lit(1)).as("freq"))
        .select(col("wd"), expr(enc0).as("enc"), col("freq"))
        .pinned
      val learned =
        scala.collection.mutable.ArrayBuffer.empty[(Int, String, String,
          String, Long)]
      var k = 1
      while (k <= n) {
        val best = vocab
          .select(expr("split(trim(enc), '  ')").as("t"), col("freq"))
          .filter(size(col("t")) >= 2)
          .select(explode(expr("transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS lhs, " +
            "element_at(t, i + 1) AS rhs))")).as("p"), col("freq"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum("freq").as("pair_n"))
          .orderBy(col("pair_n").desc, col("lhs"), col("rhs"))
          .limit(1).collect()
        // Fail-loud parity with the unrolled oracle: its chain CROSS
        // JOINs each stage to the (then-empty) argmax row and would
        // silently collapse to an empty vocabulary, so a corpus too
        // small to support all n merges must be rejected, not truncated.
        require(best.nonEmpty,
          s"BPE learning exhausted after ${k - 1} of $n merges — " +
            "corpus too small for this vocabulary size")
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        learned += ((k, l, r, l + r, best(0).getLong(2)))
        vocab = vocab.select(col("wd"),
          call_function("replace", col("enc"),
            lit(s" $l  $r "), lit(s" $l$r ")).as("enc"),
          col("freq")).pinned
        k += 1
      }
      learned.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_n")
    }
  }

  /** The learned merge rules as driver-side pairs (N rows — bounded
    * metadata), for callers that fold them into row-local expressions.
    */
  def bpeMergePairs(s: SparkSession, dir: String,
      n: Int = BpeMerges): Seq[(String, String)] =
    pairsOf(bpeMerges(s, dir, n))

  /** Rank-ordered (lhs, rhs) pairs of any merge table. */
  private[ops] def pairsOf(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("merge_rank").collect().toSeq
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))

  /** THE apply path — the ordered single-pass greedy merge fold over a
    * delimited encoding column, shared by the word-cache build
    * ([[bpeVocab]]), the streaming counter ([[bpeTokenCounts]]), and
    * the staleness audit's replay (q149), so the delimiter scheme and
    * fold order can never drift between them (BpeSpec pins the
    * resulting apply-path == cache-path identity).
    */
  private[ops] def applyMerges(e0: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(e0) { case (acc, (l, r)) =>
      call_function("replace", acc, lit(s" $l  $r "), lit(s" $l$r "))
    }

  /** Row-local BPE token counting — the STREAMING twin of q140's
    * vocab-join path: every word of `text` is encoded and merged inside
    * one projection (the N merge rules fold into chained `replace`s over
    * the [[enc0]] delimited form), so the transform is stateless and
    * runs unchanged under Structured Streaming append mode, per
    * micro-batch, with zero shuffle and zero state.
    *
    * Identity law (BpeSpec): for every document this equals the q140
    * join against the materialized word cache — the apply-path ==
    * cache-path guarantee a tokenizer must keep, and what ties the
    * streaming gate to the oracle-checked batch query.
    */
  def bpeTokenCounts(df: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val wordsArr = filter(split(col("text"), " "), w => w =!= "")
    val perWord = (w: Column) => {
      val e0 = concat(lit(" "), array_join(
        transform(sequence(lit(1), length(w)),
          i => w.substr(i, lit(1))), "  "), lit(" "))
      size(split(trim(applyMerges(e0, merges)), "  "))
    }
    df.withColumn("n_bpe_tokens",
      aggregate(wordsArr, lit(0L), (acc, w) => acc + perWord(w)))
  }

  /** Encoded vocabulary `(wd, enc, freq, n_tok)` under the learned
    * merges — the tokenizer's word cache, materialized. Built by
    * REPLAYING the (driver-bounded, N-row) merge artifact as chained
    * row-local `replace`s over the initial encoding: one vocabulary
    * pass, no re-learning, no corpus pass.
    */
  def bpeVocab(s: SparkSession, dir: String,
      n: Int = BpeMerges): DataFrame =
    Materialize.table(s, s"bpe_vocab_$n", dir) {
      val applied = applyMerges(expr(enc0), bpeMergePairs(s, dir, n))
      Tables(s, dir, "documents")
        .select(explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("wd").agg(count(lit(1)).as("freq"))
        .select(col("wd"), applied.as("enc"), col("freq"))
        .withColumn("n_tok", size(expr("split(trim(enc), '  ')")))
    }

  /** THE per-document token-pricing frame `(doc_id, n_words,
    * n_bpe_tokens)` — the one corpus-sized BPE computation every
    * downstream consumer shares (q140 encoding, q141 fertility, q143
    * token-budget packing, q148 loader manifest), factored to a single
    * materialized artifact so the pricing join can never drift between
    * them and the corpus pass + vocab join run once per (corpus,
    * version) instead of once per query. Plan: (doc, word) partial agg
    * (map-side combine moves one row per distinct pair, not per token)
    * → ONE word-keyed join against the [[bpeVocab]] word cache (AQE
    * broadcasts it when it fits) → skinny per-doc re-agg.
    */
  def bpeDocTokens(s: SparkSession, dir: String,
      n: Int = BpeMerges): DataFrame =
    Materialize.table(s, s"bpe_doc_tokens_$n", dir) {
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("doc_id", "wd").agg(count(lit(1)).as("c"))
        .join(bpeVocab(s, dir, n).select(col("wd"), col("n_tok")), "wd")
        .groupBy("doc_id")
        .agg(sum("c").as("n_words"),
          sum(col("c") * col("n_tok")).as("n_bpe_tokens"))
    }

  /** Oracle twin of [[bpeDocTokens]]: the `tok`/`dw`/`agg` CTE chain —
    * appended after [[bpeLearnSql]] — exposing
    * `agg(doc_id, n_words, n_bpe_tokens)`. One definition for the same
    * four consumers, mirroring the single Spark-side artifact.
    */
  private[ops] def bpeDocSql(n: Int = BpeMerges): String =
    s""",
       |tok AS (SELECT wd, len(string_split(trim(enc), '  ')) AS n_tok
       |  FROM v$n),
       |dw AS (SELECT doc_id, wd, count(*) AS c FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS wd
       |    FROM documents) t
       |  WHERE wd <> '' GROUP BY doc_id, wd),
       |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
       |    CAST(sum(c * n_tok) AS BIGINT) AS n_bpe_tokens
       |  FROM dw JOIN tok USING (wd) GROUP BY doc_id)""".stripMargin

  /** The BPE-priced PACK COORDINATE frame `(source, doc_id, n_tok,
    * tok_offset)` shared by q143 packing, q148 loader manifest, q191
    * curriculum, and q194 intra-pack audit: each document's running
    * token offset within its source stream — the 2048-token pack
    * coordinate system every export/audit stage prices against. One
    * definition per side so the pricing window can never drift between
    * consumers. Oracle: the `t2`/`o` CTEs appended after
    * [[bpeDocSql]]'s `agg`; Spark: [[bpePackOffsets]].
    */
  private[ops] def bpePackSql: String =
    s""",
       |t2 AS (SELECT d.source, d.doc_id, a.n_bpe_tokens AS n_tok
       |  FROM agg a JOIN documents d USING (doc_id)),
       |o AS (SELECT source, doc_id, n_tok,
       |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS tok_offset
       |  FROM t2)""".stripMargin

  /** Spark twin of [[bpePackSql]] — see its scaladoc. The window
    * partitions by source (parallel across strata); the corpus-sized
    * work is [[bpeDocTokens]]'s materialized artifact.
    */
  def bpePackOffsets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bpeDocTokens(s, dir)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tok"))
      .join(Tables(s, dir, "documents").select("doc_id", "source"),
        "doc_id")
      .withColumn("tok_offset",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select("source", "doc_id", "n_tok", "tok_offset")
  }
}
