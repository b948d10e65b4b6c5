package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.engine.Tables
import graft.engine.Pin.Pinnable

/** Data-curation operators a production training-data pipeline runs between
  * ingestion and packing: PII detection/redaction, heuristic quality
  * filtering (the Gopher-rule family), TF-IDF term salience, temperature-
  * based domain mixing, and Bloom-filter benchmark decontamination.
  *
  * All are per-row expressions or one-shuffle aggregates; nothing collects
  * to the driver and nothing depends on partition count, so every query
  * here runs unchanged on a 1000-executor cluster. Regexes are kept in the
  * RE2-compatible subset (no backrefs/lookaround) so Spark's Java regex
  * and the DuckDB oracle's RE2 agree match-for-match.
  *
  * The corpus ships no real PII, so [[piiAugmented]] plants deterministic
  * synthetic spans (email/phone/IPv4, keyed on doc_id) in BOTH engines —
  * the scan and redaction then do real work and stay hash-checked.
  */
object CurationOps {

  private val words = "split(text, ' ')"

  /** Deterministic synthetic-PII augmentation, Spark side. Must stay
    * textually in lockstep with [[piiAugSql]].
    */
  private def piiAugmented(df: DataFrame): DataFrame =
    df.withColumn("aug",
      concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" host 10.0."), (col("doc_id") % 250).cast("string"),
            lit(".7"))).otherwise(lit(""))))

  /** The same augmentation as a DuckDB scalar expression over `documents`. */
  private val piiAugSql: String =
    """text
      | || CASE WHEN doc_id % 7 = 0 THEN ' contact u' ||
      |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
      | || CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      | || CASE WHEN doc_id % 3 = 0 THEN ' host 10.0.' ||
      |      CAST(doc_id % 250 AS VARCHAR) || '.7' ELSE '' END"""
      .stripMargin.replace("\n", "")

  private val emailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private val phoneRe = """\d{3}-\d{3}-\d{4}"""
  private val ipRe = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"""

  /** 6-hex-digit window of a sha256 hex string parsed to its numeric
    * value — pure ascii/CASE arithmetic shared verbatim by Spark SQL and
    * DuckDB, so both engines compute identical Bloom bit positions
    * (16^5·d0 + … + d5, then mod the filter size). 24 bits: every
    * intermediate fits an INT32, every sum a BIGINT, under ANSI mode.
    */
  private def hexWindow(h: String, off: Int): String =
    (0 until 6).map { i =>
      val p = math.pow(16, 5 - i).toLong
      s"CAST($p AS BIGINT) * (ascii(substr($h, ${off + i}, 1)) - " +
        s"(CASE WHEN ascii(substr($h, ${off + i}, 1)) >= 97 " +
        "THEN 87 ELSE 48 END))"
    }.mkString("(", " + ", ")")

  /** Bloom bit position k over hash column `h` (m = 16384 bits). */
  private def bloomPos(h: String, off: Int): String =
    s"(${hexWindow(h, off)}) % 16384"

  /** Streaming-safe PII redaction: a pure projection over `text` (no
    * sort, no aggregate), so it composes unchanged into a readStream
    * pipeline — CurationStreamSpec asserts stream output == batch
    * output row-for-row. Adds `red` (redacted text) and `n_pii` (span
    * count before redaction).
    */
  def redactPii(df: DataFrame): DataFrame =
    df.withColumn("red",
        regexp_replace(regexp_replace(regexp_replace(
          col("text"), emailRe, "[EMAIL]"), phoneRe, "[PHONE]"),
          ipRe, "[IP]"))
      .withColumn("n_pii",
        regexp_count(col("text"), lit(emailRe)) +
          regexp_count(col("text"), lit(phoneRe)) +
          regexp_count(col("text"), lit(ipRe)))

  /** Streaming-safe quality floor (q82's keep verdict as a row-local
    * filter) — the bronze→silver curation gate a streaming ingest runs
    * per micro-batch.
    */
  def qualityKeep(df: DataFrame): DataFrame = {
    val nW = s"size($words)"
    df.filter(
      expr(s"$nW between 30 and 100000") &&
        expr(s"cast(length(replace(text, ' ', '')) as double) / $nW " +
          "between 3.0 and 10.0") &&
        expr(s"cast(size(filter($words, w -> w rlike '^[a-z]+$$')) " +
          s"as double) / $nW >= 0.8") &&
        expr(s"size(filter($words, " +
          "w -> w in ('the','a','of','and'))) >= 2") &&
        expr(s"1.0 - cast(size(array_distinct($words)) as double) / $nW " +
          "<= 0.9"))
  }

  val defs: Seq[QueryDef] = Seq(

    // PII scan: per-document counts of email / phone / IPv4 spans plus
    // the has-PII verdict. Pure per-row regex counting — fuses into the
    // scan, zero shuffle, linear at any corpus size.
    QueryDef(
      "q80_pii_scan",
      s"""WITH a AS (SELECT doc_id, $piiAugSql AS aug FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '$emailRe')) AS INTEGER)
         |    AS n_email,
         |  CAST(len(regexp_extract_all(aug, '$phoneRe')) AS INTEGER)
         |    AS n_phone,
         |  CAST(len(regexp_extract_all(aug, '$ipRe')) AS INTEGER) AS n_ip,
         |  len(regexp_extract_all(aug, '$emailRe'))
         |    + len(regexp_extract_all(aug, '$phoneRe'))
         |    + len(regexp_extract_all(aug, '$ipRe')) > 0 AS has_pii
         |FROM a ORDER BY doc_id""".stripMargin) { (s, dir) =>
      piiAugmented(Tables(s, dir, "documents"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).as("n_email"),
          regexp_count(col("aug"), lit(phoneRe)).as("n_phone"),
          regexp_count(col("aug"), lit(ipRe)).as("n_ip"))
        .withColumn("has_pii",
          col("n_email") + col("n_phone") + col("n_ip") > 0)
        .orderBy("doc_id")
    },

    // PII redaction: replace every span with a typed placeholder, ship
    // the redacted text's hash + length delta (the redacted corpus itself
    // would be the written output in production; the hash pins it
    // byte-for-byte without shipping text through the artifact).
    // Replacement order email → phone → ip is load-bearing: the email
    // regex consumes its dotted domain before the IPv4 pattern can see it.
    QueryDef(
      "q81_pii_redact",
      s"""WITH a AS (SELECT doc_id, $piiAugSql AS aug FROM documents),
         |r AS (SELECT doc_id, aug, regexp_replace(regexp_replace(
         |    regexp_replace(aug, '$emailRe', '[EMAIL]', 'g'),
         |    '$phoneRe', '[PHONE]', 'g'), '$ipRe', '[IP]', 'g') AS red
         |  FROM a)
         |SELECT doc_id, sha256(red) AS red_sha,
         |  CAST(length(aug) - length(red) AS INTEGER) AS n_chars_removed
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      piiAugmented(Tables(s, dir, "documents"))
        .withColumn("red",
          regexp_replace(regexp_replace(regexp_replace(
            col("aug"), emailRe, "[EMAIL]"), phoneRe, "[PHONE]"),
            ipRe, "[IP]"))
        .select(col("doc_id"), sha2(col("red"), 256).as("red_sha"),
          (length(col("aug")) - length(col("red"))).as("n_chars_removed"))
        .orderBy("doc_id")
    },

    // Gopher-style heuristic quality filter: word count bounds, mean
    // word length window, all-alphabetic word fraction, stopword
    // presence, duplicate-word fraction → one keep/drop verdict with the
    // individual rule verdicts alongside (a pipeline tunes thresholds by
    // inspecting WHICH rule fired, not just the verdict). Per-row HOFs,
    // no shuffle.
    QueryDef(
      "q82_quality_filter",
      """WITH q AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS mwl,
        |    CAST(len(list_filter(string_split(text, ' '),
        |        w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS alpha_frac,
        |    len(list_filter(string_split(text, ' '),
        |        w -> w IN ('the','a','of','and'))) >= 2 AS has_stop,
        |    1.0 - CAST(len(list_distinct(string_split(text, ' ')))
        |        AS DOUBLE) / len(string_split(text, ' ')) AS dup_frac
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
        |  round(mwl, 6) AS mean_word_len,
        |  round(alpha_frac, 6) AS alpha_frac,
        |  round(dup_frac, 6) AS dup_frac,
        |  n_words BETWEEN 30 AND 100000 AS len_ok,
        |  mwl BETWEEN 3.0 AND 10.0 AS mwl_ok,
        |  alpha_frac >= 0.8 AS alpha_ok, has_stop AS stop_ok,
        |  dup_frac <= 0.9 AS rep_ok,
        |  n_words BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
        |    AND alpha_frac >= 0.8 AND has_stop AND dup_frac <= 0.9 AS keep
        |FROM q ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val nW = s"size($words)"
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          expr(nW).as("n_words"),
          expr(s"cast(length(replace(text, ' ', '')) as double) / $nW")
            .as("mwl"),
          expr(s"cast(size(filter($words, w -> w rlike '^[a-z]+$$')) " +
            s"as double) / $nW").as("alpha_frac"),
          expr(s"size(filter($words, " +
            "w -> w in ('the','a','of','and'))) >= 2").as("has_stop"),
          expr(s"1.0 - cast(size(array_distinct($words)) as double) / $nW")
            .as("dup_frac"))
        .select(col("doc_id"), col("n_words").cast("int").as("n_words"),
          round(col("mwl"), 6).as("mean_word_len"),
          round(col("alpha_frac"), 6).as("alpha_frac"),
          round(col("dup_frac"), 6).as("dup_frac"),
          col("n_words").between(30, 100000).as("len_ok"),
          col("mwl").between(3.0, 10.0).as("mwl_ok"),
          (col("alpha_frac") >= 0.8).as("alpha_ok"),
          col("has_stop").as("stop_ok"),
          (col("dup_frac") <= 0.9).as("rep_ok"),
          (col("n_words").between(30, 100000) &&
            col("mwl").between(3.0, 10.0) && col("alpha_frac") >= 0.8 &&
            col("has_stop") && col("dup_frac") <= 0.9).as("keep"))
        .orderBy("doc_id")
    },

    // TF-IDF top terms per document. Plan shape: explode → ONE
    // (doc, word) hash aggregate; document frequency and per-doc rank are
    // windows over that aggregate (no self-join, no second corpus scan).
    // The (doc, word) shuffle is the only corpus-sized exchange — the
    // same bound as q72's repetition stats. Corpus size N arrives via a
    // broadcast 1-row aggregate, never a driver action.
    QueryDef(
      "q83_tfidf_top_terms",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w
        |  WHERE word <> '' GROUP BY doc_id, word),
        |df AS (SELECT doc_id, word, tf,
        |    count(*) OVER (PARTITION BY word) AS df FROM tf),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, word, tf, df,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM df, n),
        |r AS (SELECT doc_id, word, tf, df, tfidf, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn FROM sc)
        |SELECT doc_id, word, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, tfidf, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { (s, dir) =>
      // served from the shared inverted-index artifact — TF-IDF and
      // BM25 tokenize the corpus once between them, at index build
      val n = broadcast(corpusStats(s, dir).select("n_docs"))
      val tf = postings(s, dir)
        .select(col("doc_id"), col("term").as("word"), col("tf"))
        .filter(col("word") =!= "")
      val wDf = Window.partitionBy("word")
      val wRank = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("word"))
      tf.withColumn("df", count(lit(1)).over(wDf))
        .crossJoin(n)
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("df"),
          col("tfidf"), col("rn"))
        .orderBy("doc_id", "rn")
    },

    // Temperature-based domain mixing (the sampling-weight step of
    // multi-source pretraining): per-language corpus shares p flattened
    // by alpha = 0.5 (w ∝ p^0.5), normalized, and turned into target doc
    // counts at a 1000-doc budget. alpha = 0.5 makes pow() a correctly-
    // rounded IEEE sqrt in both engines, and the weight sum accumulates
    // in DECIMAL so partial-aggregation order can never wiggle a bit.
    QueryDef(
      "q84_domain_mixture",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
        |w AS (SELECT lang, n,
        |    CAST(round(sqrt(n / total), 6) AS DECIMAL(18, 6)) AS wt
        |  FROM c, t),
        |s AS (SELECT CAST(sum(wt) AS DOUBLE) AS wsum FROM w)
        |SELECT lang, CAST(n AS BIGINT) AS n,
        |  round(n / total, 6) AS p,
        |  round(CAST(wt AS DOUBLE) / wsum, 6) AS mix_frac,
        |  CAST(round(CAST(wt AS DOUBLE) / wsum * 1000, 0) AS BIGINT)
        |    AS target_docs
        |FROM w, s, t ORDER BY lang""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n"))
      val t = broadcast(c.agg(sum(col("n")).cast("double").as("total")))
      val w = c.crossJoin(t).withColumn("wt",
        round(sqrt(col("n") / col("total")), 6).cast(DecimalType(18, 6)))
      val ws = broadcast(w.agg(sum(col("wt")).cast("double").as("wsum")))
      w.crossJoin(ws)
        .select(col("lang"), col("n").cast("long").as("n"),
          round(col("n") / col("total"), 6).as("p"),
          round(col("wt").cast("double") / col("wsum"), 6).as("mix_frac"),
          round(col("wt").cast("double") / col("wsum") * 1000, 0)
            .cast("long").as("target_docs"))
        .orderBy("lang")
    },

    // Training-mix planner — q84's temperature weights turned into the
    // numbers a data loader actually consumes: for a fixed token budget
    // (100k here), each source's sampled-token allocation and its epoch
    // count (allocation / available tokens; > 1 = the source is
    // upsampled and will repeat). The whole plan derives from ONE
    // per-source token aggregate plus two 1-row broadcasts — at 100 TB
    // the planner costs a corpus scan's metadata, not the corpus.
    QueryDef(
      "q114_mix_planner",
      """WITH c AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |    AS src_tokens FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS total FROM c),
        |w AS (SELECT source, src_tokens,
        |    CAST(round(sqrt(src_tokens / total), 6) AS DECIMAL(18, 6))
        |      AS wt
        |  FROM c, t),
        |s AS (SELECT CAST(sum(wt) AS DOUBLE) AS wsum FROM w)
        |SELECT source, src_tokens,
        |  round(CAST(wt AS DOUBLE) / wsum, 6) AS mix_frac,
        |  CAST(round(CAST(wt AS DOUBLE) / wsum * 100000, 0) AS BIGINT)
        |    AS sampled_tokens,
        |  round(round(CAST(wt AS DOUBLE) / wsum * 100000, 0)
        |    / src_tokens, 6) AS epochs
        |FROM w, s ORDER BY source""".stripMargin) { (s, dir) =>
      // The planner frame is sources-sized (tiny); checkpointing it
      // eagerly means the corpus token aggregate runs ONCE, however many
      // times the plan algebra references it (total, wsum, and the final
      // projection would otherwise each re-expand the corpus scan).
      val c = Tables(s, dir, "documents").groupBy("source")
        .agg(expr("cast(sum(size(split(text, ' '))) as bigint)")
          .as("src_tokens"))
        .pinned
      val t = broadcast(c.agg(
        sum(col("src_tokens")).cast("double").as("total")))
      val w = c.crossJoin(t).withColumn("wt",
        round(sqrt(col("src_tokens") / col("total")), 6)
          .cast(DecimalType(18, 6)))
      val ws = broadcast(w.agg(sum(col("wt")).cast("double").as("wsum")))
      w.crossJoin(ws)
        .select(col("source"), col("src_tokens"),
          round(col("wt").cast("double") / col("wsum"), 6).as("mix_frac"),
          round(col("wt").cast("double") / col("wsum") * 100000, 0)
            .cast("long").as("sampled_tokens"),
          round(round(col("wt").cast("double") / col("wsum") * 100000, 0)
            / col("src_tokens"), 6).as("epochs"))
        .orderBy("source")
    },

    // Character-trigram log-probability score — the perplexity-proxy
    // quality filter (CCNet-style: score text against an n-gram language
    // model; here the model is the corpus's own trigram statistics, so
    // the operator is self-contained and oracle-exact). Plan: the
    // counts table IS the trained artifact (materialized trigram_lm —
    // alphabet³-bounded, broadcast); scoring is one generator pass that
    // fuses into the corpus scan, decimal-accumulated per-doc mean of
    // rounded logs (partial-agg order can't wiggle a bit).
    QueryDef(
      "q94_trigram_logprob",
      """WITH tri AS (SELECT doc_id, unnest(list_transform(
        |    range(1, length(text) - 1), i -> substr(text, i, 3))) AS t
        |  FROM documents WHERE length(text) >= 3),
        |c3 AS (SELECT t, count(*) AS n3 FROM tri GROUP BY t),
        |c2 AS (SELECT substr(t, 1, 2) AS p, sum(n3) AS n2 FROM c3
        |  GROUP BY p),
        |sc AS (SELECT tri.doc_id,
        |    round(ln(CAST(n3 AS DOUBLE) / n2), 9) AS lp
        |  FROM tri JOIN c3 ON c3.t = tri.t
        |  JOIN c2 ON c2.p = substr(tri.t, 1, 2))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
        |  round(CAST(SUM(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
        |    AS mean_logp
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      trigramDocScores(s, dir)
        .select("doc_id", "n_tri", "mean_logp")
        .orderBy("doc_id")
    },

    // Per-source corpus report card — the "datasheet" aggregate a data
    // team reads before training: document counts, quality-gate keep
    // rate (q82's rules), mean quality score (q30's definition, DECIMAL-
    // accumulated so partial-agg order can't wiggle a bit), token
    // volume, and language spread. One corpus scan, one hash aggregate
    // keyed by source.
    QueryDef(
      "q91_corpus_report",
      """WITH q AS (SELECT source, lang,
        |    len(string_split(text,' ')) AS n_words,
        |    CAST(length(replace(text,' ','')) AS DOUBLE)
        |      / len(string_split(text,' ')) AS mwl,
        |    CAST(len(list_filter(string_split(text,' '),
        |        w -> regexp_full_match(w,'[a-z]+'))) AS DOUBLE)
        |      / len(string_split(text,' ')) AS alpha_frac,
        |    len(list_filter(string_split(text,' '),
        |        w -> w IN ('the','a','of','and'))) >= 2 AS has_stop,
        |    1.0 - CAST(len(list_distinct(string_split(text,' ')))
        |        AS DOUBLE) / len(string_split(text,' ')) AS dup_frac,
        |    least(1.0, len(string_split(text,' ')) / 100.0)
        |      * (1.0 - CAST(len(list_filter(string_split(text,' '),
        |          w -> w IN ('the','a'))) AS DOUBLE)
        |        / len(string_split(text,' '))) AS quality
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_words BETWEEN 30 AND 100000
        |    AND mwl BETWEEN 3.0 AND 10.0 AND alpha_frac >= 0.8
        |    AND has_stop AND dup_frac <= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_keep,
        |  round(CAST(SUM(CASE WHEN n_words BETWEEN 30 AND 100000
        |    AND mwl BETWEEN 3.0 AND 10.0 AND alpha_frac >= 0.8
        |    AND has_stop AND dup_frac <= 0.9 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS keep_rate,
        |  round(CAST(SUM(CAST(quality AS DECIMAL(18,9))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_quality,
        |  CAST(SUM(n_words) AS BIGINT) AS total_tokens,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM q GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val nW = s"size($words)"
      val keepExpr = expr(s"$nW between 30 and 100000") &&
        expr(s"cast(length(replace(text, ' ', '')) as double) / $nW " +
          "between 3.0 and 10.0") &&
        expr(s"cast(size(filter($words, w -> w rlike '^[a-z]+$$')) " +
          s"as double) / $nW >= 0.8") &&
        expr(s"size(filter($words, " +
          "w -> w in ('the','a','of','and'))) >= 2") &&
        expr(s"1.0 - cast(size(array_distinct($words)) as double) / $nW " +
          "<= 0.9")
      Tables(s, dir, "documents")
        .select(col("source"), col("lang"),
          expr(nW).as("n_words"),
          keepExpr.as("keep"),
          expr(s"least(1.0, $nW / 100.0) * (1.0 - " +
            s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
            s" / $nW)").as("quality"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          round(sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 6).as("keep_rate"),
          round(sum(col("quality").cast(DecimalType(18, 9))).cast("double") /
            count(lit(1)), 6).as("mean_quality"),
          sum(col("n_words")).cast("long").as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("source")
    },

    // Bloom-filter benchmark decontamination — the 100 TB scale path of
    // q37's exact-join form. The filter is expressed RELATIONALLY: the
    // benchmark set's k=3 sha256-derived bit positions (m = 16384)
    // aggregate into one sorted array (collect_set — in-plan, never a
    // driver collect) that broadcasts to the corpus scan; a doc is
    // flagged iff all 3 of its positions are set. That is exactly a
    // Bloom membership probe, so the corpus side stays a single
    // shuffle-free pass whatever its size, while the bloom side is
    // bounded by min(3·|bench|, m) longs. False positives are possible
    // by construction and false negatives are not — the oracle
    // recomputes the identical filter, so the artifact pins both the
    // flag set and each flag's exact-hit verdict. The probe includes the
    // benchmark docs themselves (their copies in a training corpus are
    // precisely what decontamination removes), so exact_hit = true rows
    // are guaranteed present.
    QueryDef(
      "q85_bloom_decontaminate", {
        val p1 = bloomPos("h", 1)
        val p2 = bloomPos("h", 7)
        val p3 = bloomPos("h", 13)
        s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
           |d AS (SELECT doc_id, text, sha256(text) AS h, m
           |  FROM documents, mx),
           |b AS (SELECT text, [$p1, $p2, $p3] AS ps FROM d
           |  WHERE doc_id > m - 10),
           |agg AS (SELECT list_sort(list_distinct(flatten(list(ps))))
           |    AS bl, list_sort(list(DISTINCT text)) AS btexts FROM b),
           |f AS (SELECT d.doc_id, d.text, btexts FROM d, agg
           |  WHERE list_contains(bl, $p1) AND list_contains(bl, $p2)
           |    AND list_contains(bl, $p3))
           |SELECT doc_id, list_contains(btexts, text) AS exact_hit
           |FROM f ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val p1 = bloomPos("h", 1)
      val p2 = bloomPos("h", 7)
      val p3 = bloomPos("h", 13)
      val docs = Tables(s, dir, "documents")
      val mx = broadcast(docs.agg(max(col("doc_id")).as("m")))
      val d = docs.crossJoin(mx)
        .select(col("doc_id"), col("text"), col("m"),
          sha2(col("text"), 256).as("h"))
      // ONE benchmark pass builds BOTH broadcast artifacts — the bit-
      // position array and the exact-hit text set — as a single 1-row
      // aggregate, so the bench subtree has a single consumer and the
      // corpus is never re-scanned per artifact
      val bloom = broadcast(d.filter(col("doc_id") > col("m") - 10)
        .select(col("text"), array(expr(p1), expr(p2), expr(p3)).as("ps"))
        .agg(sort_array(array_distinct(flatten(collect_list(col("ps")))))
          .as("bl"),
          sort_array(collect_set(col("text"))).as("btexts")))
      d.crossJoin(bloom)
        .filter(array_contains(col("bl"), expr(p1)) &&
          array_contains(col("bl"), expr(p2)) &&
          array_contains(col("bl"), expr(p3)))
        .select(col("doc_id"),
          array_contains(col("btexts"), col("text")).as("exact_hit"))
        .orderBy("doc_id")
    },

    // Cross-document segment dedup — CCNet/RefinedWeb "line-level"
    // dedup adapted to a corpus without newlines: each document splits
    // into fixed 10-word segments (row-local generator, no shuffle),
    // segment frequency across DISTINCT documents is one hash
    // aggregate, and segments appearing in ≥2 documents are boilerplate
    // — rejoined as a BROADCAST (the boilerplate list is tiny by
    // definition: it's the repeated content). Ships per-doc retained
    // stats. At 100 TB the only full-corpus exchange is the segment-
    // frequency aggregate; production would exchange xxhash64(seg)
    // instead of segment text (the LSH twins q42-q44 demonstrate the
    // hashed variant), kept textual here for cross-engine hash-equality.
    QueryDef(
      "q99_segment_dedup",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w,
        |    len(string_split(text,' ')) AS n FROM documents),
        |x AS (SELECT doc_id, w, n, unnest(range(0, (n + 9) // 10)) AS i
        |  FROM t),
        |chunks AS (SELECT doc_id,
        |    array_to_string(w[(i*10+1):(i*10+least(10, n - i*10))], ' ')
        |      AS seg,
        |    least(10, n - i*10) AS nw
        |  FROM x),
        |freq AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM chunks
        |  GROUP BY 1)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boilerplate,
        |  CAST(SUM(CASE WHEN f.nd >= 2 THEN 0 ELSE c.nw END) AS BIGINT)
        |    AS n_tokens_kept
        |FROM chunks c JOIN freq f ON c.seg = f.seg
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val segs = segments(s, dir)
      // boilerplate set served from the materialized segment-frequency
      // index — the corpus pass here is the per-doc stats join only
      val boiler = segmentFreq(s, dir)
        .filter(col("nd") >= 2)
        .select(col("seg"), lit(true).as("is_boiler"))
      segs.join(broadcast(boiler), Seq("seg"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segments"),
          sum(when(col("is_boiler"), 1).otherwise(0)).cast("long")
            .as("n_boilerplate"),
          sum(when(col("is_boiler"), 0).otherwise(col("nw"))).cast("long")
            .as("n_tokens_kept"))
        .orderBy("doc_id")
    },

    // Cross-source contamination matrix: for every source pair, how many
    // distinct 10-word segments they share — the audit that catches one
    // crawl feed plagiarizing or mirroring another before both are
    // upweighted in a mixture. Plan shape is scale-critical: NOT a
    // seg×seg self-join — segments group once (collect_set of sources,
    // bounded by source count), and pairs explode from each set, so the
    // pair space is #sources² per segment, independent of corpus size.
    QueryDef(
      "q100_source_overlap",
      """WITH t AS (SELECT doc_id, source, string_split(text,' ') AS w,
        |    len(string_split(text,' ')) AS n FROM documents),
        |x AS (SELECT doc_id, source, w, n,
        |    unnest(range(0, (n + 9) // 10)) AS i FROM t),
        |chunks AS (SELECT source,
        |    array_to_string(w[(i*10+1):(i*10+least(10, n - i*10))], ' ')
        |      AS seg
        |  FROM x)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(DISTINCT a.seg) AS BIGINT) AS n_shared_segments
        |FROM (SELECT DISTINCT source, seg FROM chunks) a
        |JOIN (SELECT DISTINCT source, seg FROM chunks) b
        |  ON a.seg = b.seg AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // served ENTIRELY from the segment-frequency index — the overlap
      // matrix needs no corpus pass at all once the index exists
      segmentFreq(s, dir)
        .filter(size(col("srcs")) >= 2)
        .select(explode(col("srcs")).as("source_a"), col("srcs"))
        .select(col("source_a"), explode(col("srcs")).as("source_b"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_shared_segments"))
        .orderBy("source_a", "source_b")
    },

    // BM25 retrieval scoring (k1 = 1.2, b = 0.75) — the ranked-search
    // operator a curation pipeline uses to pull topical slices out of a
    // corpus (and the classic lexical side of hybrid retrieval next to
    // q51's dense side). Query terms join as a 3-row broadcast, so the
    // corpus sees ONE (doc, term) aggregate; document frequencies and
    // corpus stats are 1-row/3-row broadcasts back into the scoring
    // expression. Per-term scores round to 6 decimals and accumulate in
    // DECIMAL so the cross-engine sum is order-free (the dsum law).
    QueryDef(
      "q102_bm25",
      """WITH qt AS (
        |  SELECT unnest(['spark','shuffle','broadcast']) AS term),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |    AVG(len(string_split(text,' '))) AS avgdl FROM documents),
        |w AS (SELECT doc_id, unnest(string_split(text,' ')) AS term,
        |    len(string_split(text,' ')) AS dl FROM documents),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf
        |  FROM w JOIN qt USING (term) GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf
        |  GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |    CAST(SUM(CAST(round(
        |      ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) *
        |      tf.tf * 2.2 /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)),
        |      6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25_r
        |  FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY 1)
        |SELECT doc_id, bm25_r FROM sc
        |ORDER BY bm25_r DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      bm25Scores(s, dir)
        .orderBy(col("bm25_r").desc, col("doc_id")).limit(20)
    },

    // Hybrid retrieval — reciprocal-rank fusion (RRF, k=60) of the
    // lexical ranker (q102's BM25) and the dense ranker (cosine against
    // a query embedding, q51's operator): the standard first stage of a
    // modern retrieval stack, and the capstone composition of the text
    // and vector halves of this engine. Each ranker contributes its
    // top-20 (rank lists, not scores — RRF is scale-free by design);
    // fusion is a full outer join of two 20-row frames, so the fuse
    // step's cost is independent of corpus size. Rank terms round to 6
    // decimals and add in decimal: cross-engine exact.
    QueryDef(
      "q104_hybrid_rrf",
      """WITH qt AS (
        |  SELECT unnest(['spark','shuffle','broadcast']) AS term),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |    AVG(len(string_split(text,' '))) AS avgdl FROM documents),
        |w AS (SELECT doc_id, unnest(string_split(text,' ')) AS term,
        |    len(string_split(text,' ')) AS dl FROM documents),
        |tf AS (SELECT doc_id, term, dl, COUNT(*) AS tf
        |  FROM w JOIN qt USING (term) GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf
        |  GROUP BY 1),
        |lex AS (SELECT tf.doc_id,
        |    CAST(SUM(CAST(round(
        |      ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1) *
        |      tf.tf * 2.2 /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl)),
        |      6) AS DECIMAL(18,6))) AS DOUBLE) AS s
        |  FROM tf JOIN df USING (term) CROSS JOIN stats GROUP BY 1),
        |lexr AS (SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
        |  FROM lex QUALIFY r <= 20),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nv
        |  FROM embeddings),
        |q AS (SELECT v AS qv, nv AS nq FROM e WHERE vec_id = 0),
        |den AS (SELECT vec_id AS doc_id,
        |    round(list_dot_product(v, qv) / (nv * nq), 6) AS c
        |  FROM e, q WHERE vec_id <> 0),
        |denr AS (SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r
        |  FROM den QUALIFY r <= 20),
        |fused AS (
        |  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
        |    CAST(CAST(CASE WHEN l.r IS NULL THEN 0
        |        ELSE round(1.0/(60+l.r), 6) END AS DECIMAL(18,6)) +
        |      CAST(CASE WHEN d.r IS NULL THEN 0
        |        ELSE round(1.0/(60+d.r), 6) END AS DECIMAL(18,6))
        |      AS DOUBLE) AS rrf
        |  FROM lexr l FULL OUTER JOIN denr d USING (doc_id))
        |SELECT doc_id, rrf FROM fused
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      // Each ranker's top-20 via orderBy().limit() — compiles to
      // TakeOrderedAndProject (per-partition bounded heaps + one
      // driver-side merge of 20-row heads), NOT the corpus-sized
      // single-partition sort a global row_number window executes.
      // Ranks are re-derived on the ≤20-row result with the SAME total
      // tie-break (score desc, doc_id), so they equal the global ranks
      // exactly and the oracle hash is unchanged; the re-rank window is
      // unpartitioned but runs over a CONSTANT 20-row frame.
      val wAll = Window.orderBy(col("s").desc, col("doc_id"))
      val lexr = bm25Scores(s, dir).withColumnRenamed("bm25_r", "s")
        .orderBy(col("s").desc, col("doc_id")).limit(20)
        .withColumn("r", row_number().over(wAll))
        .select("doc_id", "r")
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").as("v"),
        expr("sqrt(vec_dot(embedding, embedding))").as("nv"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nv").as("nq"))
      val wDen = Window.orderBy(col("c").desc, col("doc_id"))
      val denr = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          expr("round(vec_dot(v, qv) / (nv * nq), 6)").as("c"))
        .orderBy(col("c").desc, col("doc_id")).limit(20)
        .withColumn("r", row_number().over(wDen))
        .select("doc_id", "r")
      lexr.toDF("doc_id", "lr")
        .join(denr.toDF("doc_id", "dr"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (expr("cast(coalesce(round(1.0/(60+lr), 6), 0) as decimal(18,6))")
            + expr(
              "cast(coalesce(round(1.0/(60+dr), 6), 0) as decimal(18,6))"))
            .cast("double").as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
    },

    // Eval-set n-gram decontamination — the GPT-3/PaLM report style:
    // for each benchmark document, the fraction of its distinct word
    // 3-grams that also appear in a candidate training document; pairs
    // above 5% overlap are flagged (q37/q85 catch EXACT copies — this
    // catches partial/edited contamination by overlap FRACTION, and on
    // this corpus it surfaces a planted full-overlap pair). The bench
    // side is a fixed slice (doc_id % 50 = 0, ~2% of the corpus), so
    // its distinct n-gram set broadcasts and the corpus side is ONE
    // scan + one (bench, doc) count aggregate — the pair space is
    // hits-bounded, never |bench|×|corpus|.
    QueryDef(
      "q107_ngram_decontaminate",
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, unnest(list_transform(
        |    range(1, len(ws) - 1),
        |    i -> array_to_string(ws[i:i+2], ' '))) AS ng FROM w),
        |b AS (SELECT doc_id AS b_id, ng FROM g WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id AS c_id, ng FROM g WHERE doc_id % 50 <> 0),
        |bn AS (SELECT b_id, count(*) AS n_b FROM b GROUP BY 1),
        |ov AS (SELECT b_id, c_id, count(*) AS hits FROM b JOIN c USING (ng)
        |  GROUP BY 1, 2)
        |SELECT b_id, c_id, CAST(hits AS BIGINT) AS hits,
        |  CAST(n_b AS BIGINT) AS bench_ngrams,
        |  round(CAST(hits AS DOUBLE) / n_b, 6) AS overlap_frac
        |FROM ov JOIN bn USING (b_id)
        |WHERE CAST(hits AS DOUBLE) / n_b >= 0.05
        |ORDER BY b_id, c_id""".stripMargin) { (s, dir) =>
      // the shingle_strings GENERATOR, not the transform(sequence(...))
      // HOF — the lambda form evaluates interpreted per n-gram (PERF.md
      // finding 2); lowercasing composes as the generator's child
      graft.functions.VectorExpressions.register(s)
      val g = Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(lower(text), 3)"))
        .select(col("doc_id"), col("sh").as("ng"))
        .distinct()
      val b = g.filter(col("doc_id") % 50 === 0).toDF("b_id", "ng")
      val c = g.filter(col("doc_id") % 50 =!= 0).toDF("c_id", "ng")
      val bn = b.groupBy("b_id").agg(count(lit(1)).as("n_b"))
      c.join(broadcast(b), "ng")
        .groupBy("b_id", "c_id").agg(count(lit(1)).as("hits"))
        .join(broadcast(bn), "b_id")
        .filter(col("hits").cast("double") / col("n_b") >= 0.05)
        .select(col("b_id"), col("c_id"), col("hits"),
          col("n_b").as("bench_ngrams"),
          round(col("hits").cast("double") / col("n_b"), 6)
            .as("overlap_frac"))
        .orderBy("b_id", "c_id")
    },

    // CCNet head/middle/tail buckets — the canonical use of q94's LM
    // score: rank every document per language by its trigram
    // log-probability (the perplexity proxy; higher = more fluent) and
    // cut each language into equal thirds. Downstream pipelines keep
    // "head", sample "middle", drop "tail". One extra window over q94's
    // per-doc frame; the per-language ntile is a single skinny
    // (doc_id, lang, score) exchange — no corpus re-scan.
    QueryDef(
      "q108_ccnet_buckets",
      """WITH tri AS (SELECT doc_id, lang, unnest(list_transform(
        |    range(1, length(text) - 1), i -> substr(text, i, 3))) AS t
        |  FROM documents WHERE length(text) >= 3),
        |c3 AS (SELECT t, count(*) AS n3 FROM tri GROUP BY t),
        |c2 AS (SELECT substr(t, 1, 2) AS p, sum(n3) AS n2 FROM c3
        |  GROUP BY p),
        |sc AS (SELECT tri.doc_id, tri.lang,
        |    round(ln(CAST(n3 AS DOUBLE) / n2), 9) AS lp
        |  FROM tri JOIN c3 ON c3.t = tri.t
        |  JOIN c2 ON c2.p = substr(tri.t, 1, 2)),
        |doc AS (SELECT doc_id, lang,
        |    round(CAST(SUM(CAST(lp AS DECIMAL(18,9))) AS DOUBLE)
        |      / COUNT(*), 6) AS mean_logp
        |  FROM sc GROUP BY doc_id, lang)
        |SELECT doc_id, lang, mean_logp,
        |  CASE ntile(3) OVER (PARTITION BY lang
        |      ORDER BY mean_logp DESC, doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
        |    AS bucket
        |FROM doc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val wB = Window.partitionBy("lang")
        .orderBy(col("mean_logp").desc, col("doc_id"))
      trigramDocScores(s, dir)
        .withColumn("nt", ntile(3).over(wB))
        .select(col("doc_id"), col("lang"), col("mean_logp"),
          when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    },

    // DSIR-style importance weights (Xie et al.'s data-selection
    // scheme, unigram form): score every raw document by how much more
    // likely its words are under the TARGET domain's unigram model
    // (source 'src0') than under the raw corpus's — the log importance
    // weight Σ log(p_target(w)/p_raw(w)), add-1 smoothed over the
    // shared vocabulary. Selection then samples by weight; shipping the
    // full per-doc weight table keeps the oracle total. Two corpus-
    // bounded aggregates build the (vocab-sized) weight table, which
    // re-enters as a broadcast — at 100 TB the weight table IS the
    // trained artifact (like q94's counts) and scoring fuses into the
    // corpus scan. Per-word logs round at 9 and accumulate in DECIMAL.
    QueryDef(
      "q109_dsir_weights",
      """WITH w AS (SELECT doc_id, source,
        |    unnest(string_split(lower(text), ' ')) AS wd FROM documents),
        |tc AS (SELECT wd, count(*) AS n_t FROM w WHERE source = 'src0'
        |  GROUP BY 1),
        |rc AS (SELECT wd, count(*) AS n_r FROM w GROUP BY 1),
        |tot AS (SELECT (SELECT sum(n_t) FROM tc) AS t_tot,
        |    (SELECT sum(n_r) FROM rc) AS r_tot,
        |    (SELECT count(*) FROM rc) AS vocab),
        |lr AS (SELECT rc.wd,
        |    round(ln((coalesce(tc.n_t, 0) + 1.0) / (t_tot + vocab))
        |      - ln((rc.n_r + 1.0) / (r_tot + vocab)), 9) AS lw
        |  FROM rc LEFT JOIN tc USING (wd), tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  round(CAST(sum(CAST(lw AS DECIMAL(18,9))) AS DOUBLE), 6)
        |    AS dsir_logw
        |FROM w JOIN lr USING (wd) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("wd"))
      w.join(broadcast(dsirWeights(s, dir)), "wd")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          round(sum(col("lw").cast(DecimalType(18, 9))).cast("double"), 6)
            .as("dsir_logw"))
        .orderBy("doc_id")
    },

    // Mix EXECUTION — q114 plans the temperature mix (per-source token
    // allocations); this runs it: per-source keep fractions become
    // content-addressed Bernoulli keeps (doc kept iff its hash's 24-bit
    // window, as a fraction of 2²⁴, is under the source's keep_frac), so
    // the sampled corpus is deterministic, stable as the corpus grows,
    // and identical at any cluster size — the q36/q38 discipline applied
    // to the planner's output. The audit frame compares realized vs
    // target per source. Plan shape: the planner side is two broadcast
    // 1-row frames (q114's); the corpus side is ONE scan with a
    // row-local hash + a broadcast plan join; per-source re-agg is
    // skinny. Bernoulli doc-level sampling realizes the TOKEN target in
    // expectation; the audit columns are what a mix-QA job alerts on.
    QueryDef(
      "q144_mix_execute",
      s"""WITH c AS (SELECT source,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |    AS src_tokens FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS total FROM c),
         |w AS (SELECT source, src_tokens,
         |    CAST(round(sqrt(src_tokens / total), 6) AS DECIMAL(18, 6))
         |      AS wt
         |  FROM c, t),
         |s AS (SELECT CAST(sum(wt) AS DOUBLE) AS wsum FROM w),
         |p AS (SELECT source, src_tokens,
         |    CAST(round(CAST(wt AS DOUBLE) / wsum * 100000, 0) AS BIGINT)
         |      AS target_tokens
         |  FROM w, s),
         |p2 AS (SELECT source, src_tokens, target_tokens,
         |    least(1.0, target_tokens / CAST(src_tokens AS DOUBLE))
         |      AS keep_frac FROM p),
         |d AS (SELECT source, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    sha256('mix-v1|' || CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |kept AS (SELECT d.source, d.n_tok FROM d JOIN p2 USING (source)
         |  WHERE ${hexWindow("h", 1)} / 16777216.0 < keep_frac),
         |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |    CAST(sum(n_tok) AS BIGINT) AS kept_tokens
         |  FROM kept GROUP BY source)
         |SELECT p2.source, p2.src_tokens, p2.target_tokens,
         |  COALESCE(k.n_kept, 0) AS n_kept,
         |  COALESCE(k.kept_tokens, 0) AS kept_tokens,
         |  round(COALESCE(k.kept_tokens, 0)
         |    / CAST(p2.src_tokens AS DOUBLE), 6) AS realized_frac
         |FROM p2 LEFT JOIN k USING (source)
         |ORDER BY p2.source""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      // Sources-sized planner frame, checkpointed eagerly: ONE corpus
      // pass prices the plan (q114's discipline), one more executes it.
      val c = docs.groupBy("source")
        .agg(expr("cast(sum(size(split(text, ' '))) as bigint)")
          .as("src_tokens"))
        .pinned
      val t = broadcast(c.agg(
        sum(col("src_tokens")).cast("double").as("total")))
      val w = c.crossJoin(t).withColumn("wt",
        round(sqrt(col("src_tokens") / col("total")), 6)
          .cast(DecimalType(18, 6)))
      val ws = broadcast(w.agg(sum(col("wt")).cast("double").as("wsum")))
      val plan = w.crossJoin(ws)
        .select(col("source"), col("src_tokens"),
          round(col("wt").cast("double") / col("wsum") * 100000, 0)
            .cast("long").as("target_tokens"))
        .withColumn("keep_frac",
          least(lit(1.0), col("target_tokens") / col("src_tokens")))
      val d = docs.select(col("source"), col("doc_id"),
        expr("cast(size(split(text, ' ')) as bigint)").as("n_tok"),
        sha2(concat(lit("mix-v1|"), col("doc_id").cast("string")), 256)
          .as("h"))
      val k = d.join(broadcast(plan.select("source", "keep_frac")),
          "source")
        .filter(expr(s"${hexWindow("h", 1)} / 16777216.0") <
          col("keep_frac"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_tok").as("kept_tokens"))
      plan.join(k, Seq("source"), "left")
        .select(col("source"), col("src_tokens"), col("target_tokens"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
          round(coalesce(col("kept_tokens"), lit(0L))
            / col("src_tokens").cast("double"), 6).as("realized_frac"))
        .orderBy("source")
    },

    // Data-constrained mix audit (the Muennighoff accounting): the q114
    // plan allocates tokens per source, but repeated data is worth less
    // — what matters is how many EPOCHS OVER UNIQUE TOKENS the plan
    // implies once exact duplicates collapse to their keep-first
    // representative. Per source: raw vs unique tokens, the duplicate
    // fraction, the planned allocation, and the effective unique-token
    // epoch count (>> 1 means the plan re-reads the same bytes — the
    // signal to re-weight or widen the source). Plan shape: the q114
    // planner chain + ONE keep-first dedup aggregate (q40's groupBy-text
    // shape) re-joined to its kept docs; everything downstream is
    // sources-sized.
    QueryDef(
      "q153_data_constrained_mix",
      s"""WITH c AS (SELECT source,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |    AS src_tokens FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(src_tokens) AS DOUBLE) AS total FROM c),
         |w AS (SELECT source, src_tokens,
         |    CAST(round(sqrt(src_tokens / total), 6) AS DECIMAL(18, 6))
         |      AS wt
         |  FROM c, t),
         |s AS (SELECT CAST(sum(wt) AS DOUBLE) AS wsum FROM w),
         |p AS (SELECT source, src_tokens,
         |    CAST(round(CAST(wt AS DOUBLE) / wsum * 100000, 0) AS BIGINT)
         |      AS target_tokens
         |  FROM w, s),
         |r AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |  GROUP BY text),
         |u AS (SELECT d.source,
         |    CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
         |      AS unique_tokens
         |  FROM r JOIN documents d USING (doc_id) GROUP BY d.source)
         |SELECT p.source, p.src_tokens,
         |  COALESCE(u.unique_tokens, 0) AS unique_tokens,
         |  floor((1 - COALESCE(u.unique_tokens, 0)
         |    / CAST(p.src_tokens AS DOUBLE))
         |    * 1000000) / 1000000.0 AS dup_frac,
         |  p.target_tokens,
         |  CASE WHEN COALESCE(u.unique_tokens, 0) = 0 THEN NULL
         |    ELSE floor(p.target_tokens
         |      / CAST(u.unique_tokens AS DOUBLE)
         |      * 1000000) / 1000000.0 END AS epochs_over_unique
         |FROM p LEFT JOIN u USING (source) ORDER BY p.source""".stripMargin) {
      (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val c = docs.groupBy("source")
        .agg(expr("cast(sum(size(split(text, ' '))) as bigint)")
          .as("src_tokens"))
        .pinned
      val t = broadcast(c.agg(
        sum(col("src_tokens")).cast("double").as("total")))
      val w = c.crossJoin(t).withColumn("wt",
        round(sqrt(col("src_tokens") / col("total")), 6)
          .cast(DecimalType(18, 6)))
      val ws = broadcast(w.agg(sum(col("wt")).cast("double").as("wsum")))
      val plan = w.crossJoin(ws)
        .select(col("source"), col("src_tokens"),
          round(col("wt").cast("double") / col("wsum") * 100000, 0)
            .cast("long").as("target_tokens"))
      val u = docs.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
        .join(docs.select("doc_id", "source", "text"), "doc_id")
        .groupBy("source")
        .agg(expr("cast(sum(size(split(text, ' '))) as bigint)")
          .as("unique_tokens"))
      // LEFT join + coalesce: a source whose EVERY text duplicates an
      // older source's has no keep-first representatives — exactly the
      // 100%-duplicated source this audit exists to flag. It reports
      // dup_frac = 1 and a NULL epoch count, never silently vanishes.
      plan.join(u, Seq("source"), "left")
        .select(col("source"), col("src_tokens"),
          coalesce(col("unique_tokens"), lit(0L)).as("unique_tokens"),
          (floor((lit(1) - coalesce(col("unique_tokens"), lit(0L))
            / col("src_tokens").cast("double")) * 1000000) / 1000000.0)
            .as("dup_frac"),
          col("target_tokens"),
          when(coalesce(col("unique_tokens"), lit(0L)) === 0, lit(null))
            .otherwise(floor(col("target_tokens")
              / col("unique_tokens").cast("double") * 1000000)
              / 1000000.0)
            .as("epochs_over_unique"))
        .orderBy("source")
    },

    // Zipf-fit corpus-health diagnostic: per source, the least-squares
    // slope (and r²) of ln(freq) against ln(rank) over the top-500 word
    // frequencies. Healthy natural text sits near slope −1; boilerplate
    // or template-heavy sources flatten the head and duplication steepens
    // it — a one-number screen corpus datasheets report. Determinism is
    // the q109 discipline: every ln() rounds to 9 decimals FIRST, all
    // sums accumulate in DECIMAL (exactly associative, any partition
    // order), the slope divides as double and rounds to 6. Plan: one
    // (source, word) partial-agg pass, a per-source top-500 window on the
    // sources×vocab frame, one skinny moment aggregate.
    QueryDef(
      "q146_zipf_fit",
      """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS wd
        |  FROM documents),
        |f AS (SELECT source, wd, count(*) AS freq FROM w
        |  WHERE wd <> '' GROUP BY source, wd),
        |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(freq) AS BIGINT) AS n_tokens FROM f GROUP BY source),
        |r AS (SELECT source, freq, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY freq DESC, wd) AS rnk FROM f),
        |xy AS (SELECT source,
        |    CAST(round(ln(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(15, 9))
        |      AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(15, 9))
        |      AS y
        |  FROM r WHERE rnk <= 500),
        |m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM xy GROUP BY source HAVING count(*) >= 2)
        |SELECT st.source, st.n_types, st.n_tokens,
        |  floor((m.n * m.sxy - m.sx * m.sy)
        |    / (m.n * m.sxx - m.sx * m.sx) * 1000000)
        |    / 1000000.0 AS zipf_slope,
        |  floor((m.n * m.sxy - m.sx * m.sy)
        |    * (m.n * m.sxy - m.sx * m.sy)
        |    / ((m.n * m.sxx - m.sx * m.sx)
        |      * (m.n * m.syy - m.sy * m.sy)) * 1000000)
        |    / 1000000.0 AS r2
        |FROM st JOIN m USING (source)
        |WHERE m.n * m.syy - m.sy * m.sy <> 0 ORDER BY st.source""".stripMargin) {
      (s, dir) =>
      val f = Tables(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("source", "wd").agg(count(lit(1)).as("freq"))
      val st = f.groupBy("source").agg(
        count(lit(1)).as("n_types"), sum("freq").as("n_tokens"))
      val wR = Window.partitionBy("source")
        .orderBy(col("freq").desc, col("wd"))
      // DECIMAL(15, 9) inputs: the x*y products then type as (31, 18)
      // - EXACT in both engines (a (28, 9) input pushes the product past
      // 38 digits, where Spark silently drops scale to 6 and DuckDB
      // keeps 18 - measurably different sums). The n*S algebra happens
      // in doubles CAST FROM the bit-identical decimal sums, where IEEE
      // arithmetic agrees everywhere.
      val xy = f.withColumn("rnk", row_number().over(wR))
        .filter(col("rnk") <= 500)
        .select(col("source"),
          round(log(col("rnk").cast("double")), 9)
            .cast(DecimalType(15, 9)).as("x"),
          round(log(col("freq").cast("double")), 9)
            .cast(DecimalType(15, 9)).as("y"))
      // HAVING n >= 2: a degenerate single-type source has den = 0 and
      // floor(NaN) diverges between engines — drop it from the fit
      // rather than crash (no-op on any real corpus).
      val m = xy.groupBy("source").agg(
        count(lit(1)).cast("double").as("n"),
        sum("x").cast("double").as("sx"),
        sum("y").cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
        .filter(col("n") >= 2)
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      val deny = col("n") * col("syy") - col("sy") * col("sy")
      // floor-scaled, not round(…, 6): Spark rounds doubles HALF_UP via
      // exact BigDecimal, DuckDB half-even via scaled rint — identical
      // quotients can land one ulp apart at an exact .5×10⁻⁶ boundary
      // (r2 hit one at sf0.001). floor is boundary-free on identical
      // IEEE inputs — the q121/q53 decimal-tie discipline.
      // deny == 0 (every top-500 frequency equal) makes r2 = 0/0 = NaN,
      // where floor() diverges across engines — such a source has no
      // meaningful fit; drop it (identical double predicate both sides).
      st.join(m, "source")
        .filter(deny =!= 0.0)
        .select(col("source"), col("n_types"), col("n_tokens"),
          (floor(num / den * 1000000) / 1000000.0).as("zipf_slope"),
          (floor(num * num / (den * deny) * 1000000) / 1000000.0)
            .as("r2"))
        .orderBy("source")
    },

    // Distribution-drift audit (the daily-ingest QA measure): for each
    // source, the Jensen–Shannon divergence between its unigram word
    // distribution and the REST of the corpus — which source is
    // distributionally anomalous, on a [0, ln 2] scale. Rest-counts are
    // global minus source (no per-pair recount); zero-probability terms
    // contribute exactly 0 on both engines via the CASE guard. Same
    // determinism discipline as q146: per-term ln rounds at 9, the
    // vocab-sized sum accumulates in DECIMAL. Plan: one (source, word)
    // aggregate, one broadcast global-counts join, one skinny per-source
    // fold — linear in the vocabulary, never in pairs.
    QueryDef(
      "q147_source_drift",
      """WITH sw AS (SELECT source, wd, count(*) AS sc FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS wd
        |    FROM documents) t
        |  WHERE wd <> '' GROUP BY source, wd),
        |g AS (SELECT wd, sum(sc) AS gc FROM sw GROUP BY wd),
        |tot AS (SELECT source, sum(sc) AS stot FROM sw GROUP BY source),
        |gt AS (SELECT sum(sc) AS gtot FROM sw),
        |terms AS (SELECT sw.source,
        |    CAST(sw.sc AS DOUBLE) / stot AS p,
        |    CAST(g.gc - sw.sc AS DOUBLE) / (gtot - stot) AS q
        |  FROM sw JOIN g USING (wd) JOIN tot USING (source), gt
        |  WHERE gtot > stot),
        |allw AS (SELECT t2.source,
        |    CAST(0 AS DOUBLE) AS p,
        |    CAST(g.gc AS DOUBLE) / (gtot - stot) AS q
        |  FROM g, tot t2, gt
        |  WHERE gtot > stot AND NOT EXISTS (SELECT 1 FROM sw
        |    WHERE sw.source = t2.source AND sw.wd = g.wd)),
        |u AS (SELECT * FROM terms UNION ALL SELECT * FROM allw),
        |contrib AS (SELECT source,
        |    CAST(round(CASE WHEN p > 0
        |        THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
        |      + CASE WHEN q > 0
        |        THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END, 9)
        |      AS DECIMAL(28, 9)) AS c
        |  FROM u)
        |SELECT source, round(CAST(sum(c) AS DOUBLE), 6) AS js_div
        |FROM contrib GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
      val sw = Tables(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("wd"))
        .filter(col("wd") =!= "")
        .groupBy("source", "wd").agg(count(lit(1)).as("sc"))
        .pinned
      val g = sw.groupBy("wd").agg(sum("sc").as("gc"))
      val tot = sw.groupBy("source").agg(sum("sc").as("stot"))
      val gt = broadcast(sw.agg(sum("sc").as("gtot")))
      // A single-source corpus has an empty "rest" (gtot == stot): the
      // divergence is undefined, so the source drops from the audit
      // rather than emitting Infinity (same predicate both engines).
      val terms = sw.join(g, "wd").join(broadcast(tot), "source")
        .crossJoin(gt)
        .filter(col("gtot") > col("stot"))
        .select(col("source"),
          (col("sc").cast("double") / col("stot")).as("p"),
          ((col("gc") - col("sc")).cast("double")
            / (col("gtot") - col("stot"))).as("q"))
      val allw = g.crossJoin(broadcast(tot)).crossJoin(gt)
        .filter(col("gtot") > col("stot"))
        .join(sw.select(col("source").as("s2"), col("wd").as("w2")),
          col("source") === col("s2") && col("wd") === col("w2"),
          "left_anti")
        .select(col("source"), lit(0.0).as("p"),
          (col("gc").cast("double")
            / (col("gtot") - col("stot"))).as("q"))
      val u = terms.unionByName(allw)
      val half = (c: Column, m: Column) =>
        when(c > 0, lit(0.5) * c * log(c / m)).otherwise(lit(0.0))
      u.select(col("source"),
          round(half(col("p"), (col("p") + col("q")) / 2) +
            half(col("q"), (col("p") + col("q")) / 2), 9)
            .cast(DecimalType(28, 9)).as("c"))
        .groupBy("source")
        .agg(round(sum("c").cast("double"), 6).as("js_div"))
        .orderBy("source")
    },

    // Positional PHRASE search — the inverted-index capability BM25
    // (q102) can't serve: "these exact words, adjacent, in order".
    // Served from a positional postings artifact (term, doc_id, pos) —
    // the Lucene term-position shape — by equi-joining each query term's
    // postings at consecutive offsets: w1@p ⋈ w2@(p+1) ⋈ w3@(p+2).
    // Scale shape: the phrase terms broadcast into each postings read,
    // so the scan prunes to the 3 queried terms' lists and the adjacency
    // joins run over lists-sized frames, never the corpus — phrase cost
    // is O(postings of rarest term), the classic positional-index
    // promise. Queries = the corpus's top-3 word-3-grams by occurrence
    // (n desc, gram asc — deterministic), so the query set is
    // data-derived, nonempty at every SF, and oracle-reproducible.
    QueryDef(
      "q160_phrase_search",
      """WITH s AS (SELECT doc_id, unnest(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |top AS (SELECT sh AS phrase, count(*) AS n FROM s
        |  GROUP BY sh ORDER BY n DESC, sh LIMIT 3)
        |SELECT t.phrase, s.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        |FROM s JOIN top t ON s.sh = t.phrase
        |GROUP BY t.phrase, s.doc_id
        |ORDER BY phrase, doc_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val post = positionalPostings(s, dir)
      // the 3-shingle frequency table is corpus-derived and
      // query-independent — a materialized index like [[postings]]:
      // build once per corpus version, so the per-query cost is the
      // top-3 selection over the (vocabulary-sized) artifact plus the
      // positional adjacency joins, never a corpus re-shingling pass.
      // The phrase head is bounded by construction (LIMIT 3): collect
      // it once (guide §5 — a bounded driver read, not a data collect)
      // so (a) the top-3 derivation runs once instead of once per
      // adjacency leg, and (b) the queried words reach the postings
      // scan as an In() literal — PushedFilters prunes the artifact to
      // the 3 phrases' lists at the parquet reader (guide §6), where
      // the former per-leg broadcast join re-scanned the full
      // token-scale artifact three times. The pruned lists pin once
      // and all three legs read executor-local blocks.
      val topLocal: Seq[String] = shingle3Freq(s, dir)
        .orderBy(col("n").desc, col("sh")).limit(3)
        .select(col("sh")).collect().toSeq.map(_.getString(0))
      if (topLocal.isEmpty)
        post.select(lit("").as("phrase"), col("doc_id"),
          lit(0L).as("n_occ")).limit(0)
      else {
        val words = topLocal.flatMap(_.split(" ")).distinct
        val lists = post.filter(col("term").isin(words: _*))
        // adjacency WITHOUT self-joins (§2.4 — remove shuffles
        // outright): each posting row contributes, per (phrase, leg)
        // whose word it matches, one (phrase, doc, base-position, leg)
        // row where base = pos - leg offset; a phrase occurs at a base
        // exactly when ALL THREE legs land there (positions are unique
        // per doc, so each leg contributes at most one row per base
        // and count == 3 ⇔ w1@base ∧ w2@base+1 ∧ w3@base+2 — the same
        // predicate the former w1 ⋈ w2 ⋈ w3 equi-join chain computed
        // with three pruned scans and two shuffles). One pruned scan,
        // two aggregates, zero joins; the 9 (phrase, word, offset)
        // match arms are literals from the bounded head.
        val arms = topLocal.flatMap { p =>
          p.split(" ", 3).zipWithIndex.map { case (w, i) =>
            when(col("term") === lit(w),
              struct(lit(p).as("phrase"),
                (col("pos") - i).as("base"), lit(i).as("leg")))
          }
        }
        lists
          .select(col("doc_id"),
            explode(filter(array(arms: _*), x => x.isNotNull)).as("c"))
          .select(col("c.phrase").as("phrase"), col("doc_id"),
            col("c.base").as("base"))
          .groupBy("phrase", "doc_id", "base")
          .agg(count(lit(1)).as("nl"))
          .filter(col("nl") === 3)
          .groupBy("phrase", "doc_id")
          .agg(count(lit(1)).as("n_occ"))
          .orderBy("phrase", "doc_id")
      }
    },

    // EXACT AUC of a classifier score at corpus scale — the
    // Mann-Whitney formulation with tie correction, evaluated here for
    // the q34 stopword-count heuristic as an English detector (score =
    // en_hits, label = lang 'en'). AUC·2·n₊·n₋ = Σ_s (2·n₊(s)·n₋(<s)
    // + n₊(s)·n₋(s)) over the SCORE-GROUPED frame: one aggregate to
    // (score, n_pos, n_neg), one running window over distinct scores,
    // one fold — never a pairwise join, never a global sort of rows
    // (only of distinct score values), and every term is an INTEGER, so
    // the heavily-tied integer score exercises exactly the tie
    // machinery sklearn users forget. One float division at the end,
    // floor-scaled. (On this synthetic corpus every lang draws from the
    // same vocabulary, so the measured AUC ≈ 0.506 — the eval op doing
    // its job: q34's heuristic is near-chance here, consistent with
    // q79's confusion audit.)
    QueryDef(
      "q175_exact_auc",
      """WITH sc AS (SELECT
        |    len(list_filter(string_split(text,' '),
        |      w -> w IN ('the','a','of'))) AS s,
        |    CAST(lang = 'en' AS INTEGER) AS y
        |  FROM documents),
        |g AS (SELECT s, CAST(sum(y) AS BIGINT) AS np,
        |    CAST(sum(1 - y) AS BIGINT) AS nn
        |  FROM sc GROUP BY s),
        |c AS (SELECT s, np, nn,
        |    COALESCE(SUM(nn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS nlt
        |  FROM g),
        |t AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |    CAST(sum(nn) AS BIGINT) AS n_neg,
        |    CAST(sum(2 * np * nlt + np * nn) AS BIGINT) AS auc2
        |  FROM c)
        |SELECT n_pos, n_neg,
        |  floor(auc2 / (2.0 * n_pos * n_neg) * 1000000) / 1000000.0
        |    AS auc
        |FROM t""".stripMargin) { (s, dir) =>
      val sc = Tables(s, dir, "documents").select(
        expr("size(filter(split(text, ' '), " +
          "w -> w in ('the','a','of')))").as("s"),
        (col("lang") === "en").cast("int").as("y"))
      val g = sc.groupBy("s").agg(sum("y").as("np"),
        sum(lit(1) - col("y")).as("nn"))
      val w = Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("nlt", coalesce(sum("nn").over(w), lit(0L)))
        .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
          sum(lit(2) * col("np") * col("nlt") + col("np") * col("nn"))
            .as("auc2"))
        .select(col("n_pos"), col("n_neg"),
          (floor(col("auc2") / (lit(2.0) * col("n_pos") * col("n_neg"))
            * 1000000) / 1000000.0).as("auc"))
    },

    // Reliability table for the same integer score: per score value,
    // how many docs and what fraction are actually English — the
    // calibration read that tells a curator where to put the q34
    // threshold (and whether the score is monotone in practice). Exact
    // integer counts; the fraction is one floor-scaled division per
    // score value.
    QueryDef(
      "q176_score_reliability",
      """WITH sc AS (SELECT
        |    CAST(len(list_filter(string_split(text,' '),
        |      w -> w IN ('the','a','of'))) AS INTEGER) AS s,
        |    CAST(lang = 'en' AS INTEGER) AS y
        |  FROM documents)
        |SELECT s, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_en,
        |  floor(sum(y) / CAST(count(*) AS DOUBLE) * 1000000)
        |    / 1000000.0 AS frac_en
        |FROM sc GROUP BY s ORDER BY s""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        expr("size(filter(split(text, ' '), " +
          "w -> w in ('the','a','of')))").cast("int").as("s"),
        (col("lang") === "en").cast("int").as("y"))
        .groupBy("s")
        .agg(count(lit(1)).as("n"), sum("y").as("n_en"),
          (floor(sum("y") / count(lit(1)).cast("double") * 1000000)
            / 1000000.0).as("frac_en"))
        .orderBy("s")
    },

    // Boolean AND retrieval — the third query mode on the inverted
    // index (BM25 q102 ranks, phrase q160 demands adjacency, this
    // demands CO-OCCURRENCE): documents containing EVERY query term.
    // The classic postings-intersection: filter the index to the query
    // terms (broadcast — the scan prunes to those terms' lists), one
    // (doc, distinct-terms-hit) aggregate, keep docs hitting all |Q|.
    // Cost is O(Σ postings of the query terms), never the corpus; the
    // query set is the corpus's 4 most document-frequent words (ties
    // broken lexically), data-derived and deterministic at every SF.
    QueryDef(
      "q185_boolean_and",
      """WITH q AS (SELECT wd FROM (
        |    SELECT wd, count(DISTINCT doc_id) AS df FROM (
        |      SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |      FROM documents) t
        |    WHERE wd <> '' GROUP BY wd
        |    ORDER BY df DESC, wd LIMIT 4) h),
        |p AS (SELECT DISTINCT doc_id, wd FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |    FROM documents) t WHERE wd <> ''),
        |hits AS (SELECT p.doc_id, count(*) AS n_hit
        |  FROM p JOIN q ON q.wd = p.wd GROUP BY p.doc_id)
        |SELECT doc_id, CAST(n_hit AS INTEGER) AS n_terms
        |FROM hits WHERE n_hit = (SELECT count(*) FROM q)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val words = "split(text, ' ')"
      val p = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(expr(words)).as("wd"))
        .filter(col("wd") =!= "").distinct()
      val q = p.groupBy("wd").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("wd")).limit(4).select("wd")
      val nq = lit(4)
      p.join(broadcast(q), "wd")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        .filter(col("n_hit") === nq)
        .select(col("doc_id"), col("n_hit").cast("int").as("n_terms"))
        .orderBy("doc_id")
    },

    // TF-IDF COSINE retrieval — the vector-space-model ranker beside
    // BM25 (q102): score = tfidf(q)·tfidf(d) / (|q|·|d|), with the TRUE
    // document norm over the doc's ENTIRE term vector (not just query
    // hits), so scores are genuine cosines in [0,1] and comparable
    // across queries — the property BM25 scores lack. Scale shape: the
    // norm pass is one (doc, term) aggregate joined to the vocab-sized
    // df table (the same frames the postings artifact serves); the
    // query side touches 3 terms' postings. Determinism: per-term
    // weights round-6 to decimals, dots and squared norms accumulate in
    // decimal, one sqrt/divide chain at the boundary, floor-scaled.
    QueryDef(
      "q187_tfidf_cosine",
      """WITH qt AS (
        |  SELECT unnest(['spark','shuffle','broadcast']) AS term),
        |st AS (SELECT COUNT(*) AS n_docs FROM documents),
        |w AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w
        |  WHERE term <> '' GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |x AS (SELECT tf.doc_id, tf.term,
        |    CAST(round(tf.tf * ln(CAST(st.n_docs AS DOUBLE) / df.df), 6)
        |      AS DECIMAL(18,6)) AS x
        |  FROM tf JOIN df USING (term) CROSS JOIN st),
        |nd AS (SELECT doc_id,
        |    sqrt(CAST(SUM(x * x) AS DOUBLE)) AS norm_d FROM x
        |  GROUP BY doc_id),
        |qw AS (SELECT qt.term,
        |    CAST(round(ln(CAST(st.n_docs AS DOUBLE) / df.df), 6)
        |      AS DECIMAL(18,6)) AS qx
        |  FROM qt JOIN df USING (term) CROSS JOIN st),
        |nq AS (SELECT sqrt(CAST(SUM(qx * qx) AS DOUBLE)) AS norm_q
        |  FROM qw),
        |dot AS (SELECT x.doc_id, SUM(x.x * qw.qx) AS d
        |  FROM x JOIN qw USING (term) GROUP BY x.doc_id)
        |SELECT dot.doc_id,
        |  floor(CAST(dot.d AS DOUBLE) / (nd.norm_d * nq.norm_q)
        |    * 1000000) / 1000000.0 AS cos_sim
        |FROM dot JOIN nd USING (doc_id), nq
        |ORDER BY cos_sim DESC, doc_id LIMIT 20""".stripMargin) {
      (s, dir) =>
      // (doc, term, tf) is exactly the frequency tier of the
      // materialized inverted index — read [[postings]] instead of
      // re-tokenizing the corpus (the artifact keeps empty tokens to
      // stay offset-aligned; this query's vocabulary excludes them),
      // and n_docs from the 1-row [[corpusStats]] artifact instead of
      // a corpus count. Steady state: ZERO corpus passes — the same
      // index-read shape BM25 (q102) already has.
      val tf = postings(s, dir).filter(col("term") =!= "")
        .select(col("doc_id"), col("term"), col("tf"))
      val nDocs = corpusStats(s, dir).head().getLong(0)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val x = tf.join(df, "term")
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6)
            .cast(DecimalType(18, 6)).as("x"))
      val nd = x.groupBy("doc_id")
        .agg(sqrt(sum(col("x") * col("x")).cast("double")).as("norm_d"))
      val qw = df.filter(col("term")
          .isin("spark", "shuffle", "broadcast"))
        .select(col("term"),
          round(log(lit(nDocs.toDouble) / col("df")), 6)
            .cast(DecimalType(18, 6)).as("qx"))
      val nq = qw.agg(sqrt(sum(col("qx") * col("qx")).cast("double"))
        .as("norm_q"))
      x.join(broadcast(qw), "term")
        .groupBy("doc_id").agg(sum(col("x") * col("qx")).as("d"))
        .join(nd, "doc_id")
        .crossJoin(broadcast(nq))
        .select(col("doc_id"),
          (floor(col("d").cast("double")
            / (col("norm_d") * col("norm_q")) * 1000000) / 1000000.0)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("doc_id")).limit(20)
    })

  /** q109's trained artifact: the (word → log importance weight) table,
    * Σ log(p_target(w)/p_raw(w)) per word, add-1 smoothed over the raw
    * vocabulary. Two corpus-bounded aggregates; everything downstream
    * consumes it as a broadcast.
    */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val w = Tables(s, dir, "documents")
      .select(col("source"), explode(split(lower(col("text")), " "))
        .as("wd"))
    val tc = w.filter(col("source") === "src0")
      .groupBy("wd").agg(count(lit(1)).as("n_t"))
    val rc = w.groupBy("wd").agg(count(lit(1)).as("n_r"))
    val joined = rc.join(tc, Seq("wd"), "left")
    val tot = broadcast(joined.agg(
      sum(col("n_t")).as("t_tot"), sum(col("n_r")).as("r_tot"),
      count(lit(1)).as("vocab")))
    joined.crossJoin(tot).select(col("wd"),
      round(log((coalesce(col("n_t"), lit(0L)) + lit(1.0)) /
          (col("t_tot") + col("vocab"))) -
        log((col("n_r") + lit(1.0)) / (col("r_tot") + col("vocab"))),
        9).as("lw"))
  }

  /** The DSIR weight table as a driver-side model (word → lw) — the
    * "ship the model with the job" form [[scoreDsir]] consumes. Model
    * size is vocabulary-bounded.
    */
  def dsirModel(s: SparkSession, dir: String): Map[String, Double] =
    dsirWeights(s, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Row-local DSIR scoring against the literal model: words absent
    * from the vocabulary score 0, weights fold as exact scaled longs
    * (lw is scale-9 by construction), so the gate equals q109's
    * shuffle-order decimal aggregate bit-for-bit. No join, no window,
    * no aggregate, no state — the SAME transform runs unchanged under
    * Structured Streaming (CurationStreamSpec asserts stream == batch).
    * History: round 5's HOF fold looked up `wmap[w]` per word — a
    * LINEAR scan of the vocabulary per lookup (MapData has no hash
    * index), O(words × vocab) per document; `word_lm_score` is
    * O(words) against a once-per-task index. Input needs a `text`
    * column; all input columns pass through with `n_words` and
    * `dsir_logw` appended.
    */
  def scoreDsir(df: DataFrame, model: Map[String, Double]): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.withColumn("_dw",
        call_function("word_lm_score", col("text"), typedlit(model)))
      .withColumn("n_words", col("_dw.n_words"))
      .withColumn("dsir_logw", col("_dw.logw"))
      .drop("_dw")
  }

  /** q102/q104's BM25 scorer (k1 = 1.2, b = 0.75), served from a
    * materialized INVERTED INDEX ([[graft.engine.Materialize]]): the
    * postings artifact (term, doc_id, tf, dl) and the 1-row corpus
    * stats artifact build once per corpus version, and every query
    * afterwards reads postings with the term list pushed into the
    * parquet scan (`In(term, ...)` reaches the footer) — the corpus
    * text is never re-tokenized per query, which at 100 TB is the
    * difference between an index lookup and a corpus pass. Document
    * frequencies for the query terms re-enter as a broadcast; per-term
    * scores round to 6 decimals and accumulate in DECIMAL so the
    * cross-engine sum is order-free.
    */
  /** The corpus's TRAINED char-trigram language model — (t, lp =
    * log p(c₃|c₁c₂) rounded at 9) — as a materialized INDEX artifact
    * ([[graft.engine.Materialize]]): one corpus pass per corpus version
    * builds the counts (the model is alphabet³-bounded — tiny), and
    * every scoring query afterwards reads the artifact as a broadcast.
    * The trigram stream comes from the char_ngrams GENERATOR (one pass,
    * emits only 3-char slices — the transform() lambda form runs
    * interpreted per n-gram and the positions-explode form copies the
    * full text into every generated row; both measured 2-4× slower at
    * sf0.1). The conditional denominator n2 rides a window over the
    * 2-char prefix of the already-aggregated counts (model-sized, not
    * corpus-sized).
    */
  private def trigramLm(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "trigram_lm", dir) {
      graft.functions.VectorExpressions.register(s)
      val wP = Window.partitionBy(substring(col("t"), 1, 2))
      Tables(s, dir, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), expr("char_ngrams(text, 3)"))
        .toDF("doc_id", "pos", "t")
        .groupBy("t").agg(count(lit(1)).as("n3"))
        .withColumn("n2", sum(col("n3")).over(wP))
        .select(col("t"),
          round(log(col("n3").cast("double") / col("n2")), 9).as("lp"))
    }

  /** The trained trigram LM as a driver-side model (trigram → lp) — the
    * "ship the model with the job" form [[scoreTrigramLm]] consumes.
    * Model size is alphabet³-bounded (tens of KB here), so collecting
    * it is index metadata, not a corpus read.
    */
  def trigramLmModel(s: SparkSession, dir: String): Map[String, Double] =
    trigramLm(s, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Streaming-safe perplexity gate: q94's LM score as a pure row-local
    * projection against the literal model — no join, no aggregate, no
    * state — so it composes unchanged into a readStream pipeline
    * (TrigramGateSpec asserts stream == batch AND row-identity with the
    * batch [[trigramDocScores]] frame on corpus data). Unscorable rows
    * (too short / fully out-of-distribution) carry NULLs for the caller
    * to route. All input columns pass through with `n_tri` and
    * `mean_logp` appended.
    */
  def scoreTrigramLm(df: DataFrame, model: Map[String, Double]): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.withColumn("_lm",
        call_function("trigram_lm_score", col("text"), typedlit(model)))
      .withColumn("n_tri", col("_lm.n_tri"))
      .withColumn("mean_logp", col("_lm.mean_logp"))
      .drop("_lm")
  }

  /** Per-document char-trigram LM score — the shared frame behind q94
    * (raw scores) and q108 (CCNet buckets): (doc_id, lang, n_tri,
    * mean_logp). Scoring is one generator pass over the corpus joined
    * against the broadcast [[trigramLm]] artifact, folded by a
    * map-side-partial hash aggregate on (doc_id, lang) — the only
    * exchange is one skinny (doc_id, lang, count, decimal-sum) row per
    * (mapper, doc). History: round 5 staged the exploded trigram set
    * through a full-width `repartition(doc_id)` and rebuilt the model
    * inside every query — the suite's two slowest plans; the artifact +
    * partial-agg shape deleted both (round-5 verdict, What's wrong 1).
    */
  /** The per-doc LM-score artifact for other ops (q191 curriculum):
    * (doc_id, mean_logp) — q94's round-6 values, artifact-served.
    */
  private[ops] def docLmScores(s: SparkSession, dir: String): DataFrame =
    trigramDocScores(s, dir).select("doc_id", "mean_logp")

  private def trigramDocScores(s: SparkSession, dir: String): DataFrame =
    // The doc-level score frame is itself a derived INDEX (CCNet
    // materializes exactly this: per-doc LM scores, computed once per
    // corpus version, consumed by every filtering/bucketing query):
    // one skinny (doc_id, lang, n_tri, mean_logp) row per document,
    // built by the generator + broadcast-model + map-side-partial fold
    // below, then served as an artifact read to q94 (listing) AND q108
    // (buckets) — which previously each re-folded the corpus per run.
    graft.engine.Materialize.table(s, "trigram_doc_scores", dir) {
      graft.functions.VectorExpressions.register(s)
      Tables(s, dir, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"), expr("char_ngrams(text, 3)"))
        .toDF("doc_id", "lang", "pos", "t")
        .join(broadcast(trigramLm(s, dir)), "t")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_tri"),
          round(sum(col("lp").cast(DecimalType(18, 9))).cast("double") /
            count(lit(1)), 6).as("mean_logp"))
    }

  /** The corpus's materialized INVERTED INDEX: full (term, doc_id, dl,
    * tf) postings, built once per corpus version — the shared
    * tokenization artifact behind BM25 (q102/q104) and TF-IDF (q83).
    */
  private def postings(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "bm25_postings", dir) {
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"),
        explode(expr(words)).as("term"), size(expr(words)).as("dl"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    }

  /** The corpus's POSITIONAL postings artifact `(term, doc_id, pos)` —
    * the Lucene term-positions tier above [[postings]]' frequency tier,
    * built once per corpus version. `pos` is the 0-based index in the
    * raw whitespace split (empty tokens keep their slot so offsets stay
    * aligned with every other split-based operator; they match no query
    * term). At scale this is the artifact phrase/proximity queries read
    * instead of the corpus; bucketing it by term makes each query a
    * pruned scan of the queried terms' lists.
    */
  private[ops] def positionalPostings(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "positional_postings", dir) {
      Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(words)))
        .toDF("doc_id", "pos", "term")
        .select(col("term"), col("doc_id"), col("pos"))
    }

  /** 1-row corpus stats artifact (doc count, mean doc length). */
  private def corpusStats(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "bm25_stats", dir) {
      Tables(s, dir, "documents").agg(count(lit(1)).as("n_docs"),
        avg(size(expr(words))).as("avgdl"))
    }

  /** Materialized 3-shingle frequency table (sh, n) — the phrase-level
    * sibling of [[postings]]: one shingle-generator pass per corpus
    * version, consumed by phrase-frequency queries (q160's top-phrase
    * derivation) as an artifact read instead of a corpus re-shingling.
    */
  private[ops] def shingle3Freq(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "shingle3_freq", dir) {
      graft.functions.VectorExpressions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(text, 3)"))
        .groupBy("sh").agg(count(lit(1)).as("n"))
    }

  /** Materialized 3-shingle DOCUMENT frequency (sh, df) — the
    * boilerplate-detector tier beside [[shingle3Freq]] (occurrence
    * counts): one shingle pass per corpus version, consumed by the
    * heavy-hitter query (q65) as a vocabulary-sized artifact read
    * instead of a corpus re-shingle + distinct aggregation per
    * invocation — the same index-serves-the-query design as
    * [[postings]]/[[segmentFreq]].
    */
  private[ops] def shingle3Df(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "shingle3_df", dir) {
      graft.functions.VectorExpressions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(text, 3)"))
        .groupBy("sh").agg(countDistinct(col("doc_id")).as("df"))
    }

  /** Materialized segment-frequency table over [[segments]]: per
    * distinct 10-word segment, its distinct-document count and sorted
    * source set — the index behind q99 (boilerplate set) and q100
    * (cross-source overlap, which then needs NO corpus pass at all).
    */
  private def segmentFreq(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "segment_freq", dir) {
      segments(s, dir).groupBy("seg").agg(
        countDistinct("doc_id").as("nd"),
        sort_array(collect_set("source")).as("srcs"))
    }

  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val post = postings(s, dir)
    val stats = corpusStats(s, dir)
    val hits = post.filter(col("term")
      .isin("spark", "shuffle", "broadcast"))
    val dfq = hits.groupBy("term").agg(countDistinct("doc_id").as("df"))
    hits.join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(expr(
        """cast(round(
          |  ln((n_docs - df + 0.5) / (df + 0.5) + 1) *
          |  tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)),
          |  6) as decimal(18,6))""".stripMargin))
        .cast("double").as("bm25_r"))
  }

  /** Fixed 10-word segmentation of every document — the shared frame of
    * [[defs]]' q99/q100 (CCNet's "lines", synthesized for a corpus with
    * no newlines). Row-local: one sequence-explode per document, chunk
    * text assembled by slice, no shuffle. Corpus documents are never
    * empty (min 10 words), so the sequence bound `(n+9) div 10 - 1 >= 0`
    * holds.
    */
  private def segments(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), expr(words).as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("i", explode(expr("sequence(0, (n + 9) div 10 - 1)")))
      .select(col("doc_id"), col("source"),
        expr("array_join(slice(w, i*10+1, least(10, n - i*10)), ' ')")
          .as("seg"),
        expr("least(10, n - i*10)").as("nw"))
}
