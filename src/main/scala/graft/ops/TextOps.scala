package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.engine.Tables

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
      graft.functions.VectorExpressions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(text, 3)"))
        .groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("df"))
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
    })
}
