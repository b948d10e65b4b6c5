package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryDef
import graft.engine.Tables
import graft.engine.Pin.Pinnable

/** Deduplication operators for a training-data pipeline: exact hashing,
  * minhash signatures, LSH banding for near-dup candidate generation,
  * n-gram Jaccard verification, cluster resolution, and the composed
  * end-to-end keep-list.
  *
  * Scale design (100 TB): exact dedup is one hash-partitioned groupBy on
  * a 32-byte key; minhash signatures are computed row-locally by the
  * MinHashText expression (zero shuffle; one skinny (id, sig) exchange
  * is inserted only where the sig subtree fans out — PERF.md #13); LSH
  * banding turns the O(n²) pair space into a groupBy on (band, bandHash)
  * buckets — pairs are only generated inside a bucket, which is the
  * standard MinHash-LSH bound on candidate count. The all-pairs Jaccard
  * (q43) is capped to a small id range as the per-pair *verifier*; the
  * full-corpus audit (q47) stays affordable because the exact pair space
  * is itself shingle-equi-join-bounded.
  */
object DedupOps {

  private val words = "split(text, ' ')"

  // ---- DuckDB oracle fragments for the sha256-window MinHash-LSH
  // pipeline (the portable permutation family of MinHashSha): the same
  // signatures, band keys, and candidate pairs the Spark side computes,
  // expressed in ANSI SQL. Round 5 carried q44/q47 rows-only because the
  // old xxhash64 family had no SQL form; the sha window does (q85's
  // hex-ascii parse trick, 8-digit width).

  /** 8-hex-digit window of hex string column `h` at 1-based `off`,
    * parsed to its BIGINT value by pure ascii/CASE arithmetic.
    */
  private def hexVal8(h: String, off: Int): String =
    (0 until 8).map { i =>
      val p = 268435456L >> (4 * i) // 16^(7-i)
      s"CAST($p AS BIGINT) * (ascii(substr($h, ${off + i}, 1)) - " +
        s"(CASE WHEN ascii(substr($h, ${off + i}, 1)) >= 97 " +
        "THEN 87 ELSE 48 END))"
    }.mkString("(", " + ", ")")

  /** Word-3-gram shingle strings of `text` (1-based DuckDB list ops). */
  private val shingleListSql =
    "list_transform(range(1, len(string_split(text,' ')) - 1), " +
      "i -> string_split(text,' ')[i] || ' ' || " +
      "string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])"

  /** The 16 per-permutation MIN aggregates of the signature CTE. */
  private def sigSelectSql: String = (0 until 16).map { p =>
    val (h, off) = if (p < 8) ("h0", p * 8 + 1) else ("h1", (p - 8) * 8 + 1)
    s"MIN(${hexVal8(h, off)}) AS m$p"
  }.mkString(",\n        |      ")

  /** Band key = the band's sub-signature joined with ','. */
  private def bandCaseSql: String = (0 until 4).map { b =>
    val key = (0 until 4).map(i => s"CAST(m${b * 4 + i} AS VARCHAR)")
      .mkString(" || ',' || ")
    s"WHEN $b THEN $key"
  }.mkString("CASE k ", " ", " END")

  /** CTE chain computing the LSH candidate PAIRS over relation
    * `repsRel`(doc_id, text): signatures → band keys → within-bucket
    * pairs. Mirrors [[minhashSigs]] → [[bandBuckets]] →
    * [[minhashLshCandidates]] for the registered 16×4 point.
    */
  /** [[lshPairsSql]] for sibling ops composing the candidate chain into
    * their own oracles (q194's intra-pack audit).
    */
  private[ops] def lshPairsSqlPublic(repsRel: String): String =
    lshPairsSql(repsRel)

  private def lshPairsSql(repsRel: String): String =
    s"""d AS (SELECT doc_id, $shingleListSql AS sh
        |    FROM $repsRel WHERE len(string_split(text,' ')) >= 3),
        |  sg AS (SELECT doc_id, unnest(sh) AS s FROM d),
        |  hv AS (SELECT doc_id, sha256(s) AS h0, sha256('1|' || s) AS h1
        |    FROM sg),
        |  sig AS (SELECT doc_id,
        |      $sigSelectSql
        |    FROM hv GROUP BY doc_id),
        |  bands AS (SELECT doc_id, k, $bandCaseSql AS bh
        |    FROM sig, (SELECT unnest(range(0,4)) AS k)),
        |  pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |    FROM bands a JOIN bands b
        |      ON a.k = b.k AND a.bh = b.bh AND a.doc_id < b.doc_id)"""
      .stripMargin

  /** Signature + band-key CTE chain for relation `rel`(doc_id, text)
    * with CTE-name suffix `sfx` — the cross-set building block (q133
    * joins a NEW batch's bands against the corpus index's bands, so the
    * two sides need separately-named chains; [[lshPairsSql]] keeps the
    * single-relation within-set form the q44/q47/q49/q67 oracles use).
    */
  private def sigBandsSql(rel: String, sfx: String): String =
    s"""d$sfx AS (SELECT doc_id, $shingleListSql AS sh
       |    FROM $rel WHERE len(string_split(text,' ')) >= 3),
       |  sg$sfx AS (SELECT doc_id, unnest(sh) AS s FROM d$sfx),
       |  hv$sfx AS (SELECT doc_id, sha256(s) AS h0, sha256('1|' || s) AS h1
       |    FROM sg$sfx),
       |  sig$sfx AS (SELECT doc_id,
       |      $sigSelectSql
       |    FROM hv$sfx GROUP BY doc_id),
       |  bands$sfx AS (SELECT doc_id, k, $bandCaseSql AS bh
       |    FROM sig$sfx, (SELECT unnest(range(0,4)) AS k))""".stripMargin

  /** Signature-agreement estimate for a joined (sa, sb) signature pair. */
  private def estJaccardSql: String =
    (0 until 16).map(p => s"CASE WHEN sa.m$p = sb.m$p THEN 1 ELSE 0 END")
      .mkString("CAST((", " + ", ") AS DOUBLE) / 16")

  /** Integer agreement count (0..16) for the same joined pair — the
    * division-free form q203's ppm arithmetic needs.
    */
  private def agreeCountSql: String =
    (0 until 16).map(p => s"CASE WHEN sa.m$p = sb.m$p THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** DuckDB twin of [[qualityClasses]]'s score — the SAME IEEE double
    * expression tree (least → divide → multiply, identical op order), so
    * the 0.2 threshold decision is bit-identical across engines.
    */
  private val qualitySql: String =
    "least(1.0, len(string_split(text,' ')) / 100.0) * " +
      "(1.0 - CAST(len(list_filter(string_split(text,' '), " +
      "w -> w IN ('the','a'))) AS DOUBLE) / len(string_split(text,' ')))"

  /** DuckDB twin of [[keepListFrom]]'s content-addressed split rule for
    * an arbitrary id expression.
    */
  private def splitSql(idExpr: String): String =
    s"CASE WHEN substr(sha256('split-v1|' || CAST($idExpr AS VARCHAR))" +
      ", 1, 2) < 'cd' THEN 'train' " +
      s"WHEN substr(sha256('split-v1|' || CAST($idExpr AS VARCHAR))" +
      ", 1, 2) < 'e6' THEN 'val' ELSE 'test' END"

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy on normalized content.
    QueryDef(
      "q40_dedup_exact",
      """SELECT sha256(lower(trim(text))) AS h, COUNT(*) AS n,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).cast("long").as("keeper"))
        .orderBy("h")
    },

    // Keep-first dedup decision per row (window over the content hash).
    QueryDef(
      "q41_dedup_keep_first",
      """SELECT doc_id, CAST(rn AS INTEGER) AS rn, rn > 1 AS is_dup FROM (
        |  SELECT doc_id, ROW_NUMBER() OVER (
        |    PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(sha2(lower(trim(col("text"))), 256))
        .orderBy(col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), row_number().over(w).as("rn"))
        .select(col("doc_id"), col("rn"), (col("rn") > 1).as("is_dup"))
        .orderBy("doc_id")
    },

    // MinHash signatures (4 seeded hash mins over the distinct word set).
    // Per-row HOF — no shuffle; the building block for LSH banding.
    QueryDef(
      "q42_minhash_sig", {
        val mh = (i: Int) =>
          s"list_min(list_transform(list_distinct(string_split(text,' ')), " +
            s"w -> sha256('$i|'||w))) AS mh$i"
        s"""SELECT doc_id, ${(0 to 3).map(mh).mkString(", ")}
           |FROM documents ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      val mh = (i: Int) =>
        expr(s"array_min(transform(array_distinct($words), " +
          s"w -> sha2(concat('$i|', w), 256)))").as(s"mh$i")
      Tables(s, dir, "documents")
        .select(col("doc_id") +: (0 to 3).map(mh): _*)
        .orderBy("doc_id")
    },

    // N-gram Jaccard verification over a capped id range: explode distinct
    // shingles, self-join on shingle, intersection/union counts.
    QueryDef(
      "q43_jaccard_pairs",
      """WITH d AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS sh
        |  FROM documents
        |  WHERE doc_id < 30 AND len(string_split(text,' ')) >= 3),
        |s AS (SELECT doc_id, unnest(sh) AS sh FROM d),
        |c AS (SELECT doc_id, len(sh) AS n FROM d),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter,
        |  CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
        |FROM p
        |JOIN c ca ON ca.doc_id = a_id
        |JOIN c cb ON cb.doc_id = b_id
        |ORDER BY a_id, b_id""".stripMargin)(jaccardPairs(_, _)),

    // SimHash document fingerprints: per word-occurrence hash, each of 16
    // bit positions votes +1/-1 by its bit value; the sign vector packs
    // into a 16-bit fingerprint. Near-dup docs differ in few bits.
    // Bit k = high bit of hex digit k of sha256(word) — lowercase hex
    // compares lexicographically like its numeric value, so `digit >= '8'`
    // is portable to the DuckDB oracle. The 16-bit fingerprint is BY
    // DEFINITION word 0 of the row-local simhash64 (same digits, same
    // votes, same packing — SimHash64Spec), so the Spark side is one
    // row-local projection; the oracle keeps the explode + 16 sum(CASE)
    // relational formulation.
    QueryDef(
      "q45_simhash", {
        val sums = (0 until 16).map(k =>
          s"SUM(CASE WHEN substr(h, ${k + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$k")
          .mkString(",\n        |    ")
        val pack = (0 until 16).map(k =>
          s"CASE WHEN s$k > 0 THEN ${1 << k} ELSE 0 END").mkString(" + ")
        s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |  FROM documents),
           |h AS (SELECT doc_id, sha256(w) AS h FROM w),
           |b AS (SELECT doc_id,
           |    $sums
           |  FROM h GROUP BY doc_id)
           |SELECT doc_id, CAST($pack AS INTEGER) AS simhash
           |FROM b ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          expr("cast(element_at(simhash64(text), 1) as int)").as("simhash"))
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs the SCALE way, at the PRODUCTION operating
    // point: a 64-bit fingerprint (bit k = the high bit of hex digit k
    // of each word's sha256, majority-voted) banded into 4×16-bit keys,
    // equi-joined per band — by pigeonhole, any pair within hamming
    // distance 3 shares at least one intact band, so the banded join
    // finds EVERY such pair (exact, not probabilistic) while never
    // forming the all-pairs product. Each band has 2^16 possible keys,
    // so expected candidates stay LINEAR in corpus size (round 5
    // registered a 16-bit/4-bit-band toy point whose 64 total join keys
    // made the self-join ~n²/16 — the round-5 verdict's one quadratic
    // plan; band width scales with log(n)). The fingerprint is carried
    // as four 16-bit words (b0..b3) rather than one packed BIGINT: the
    // band key IS the word, and hamming = Σ bit_count(xor) per word —
    // identical semantics, no sign-bit gymnastics in either engine.
    // The fingerprint itself is the row-local `simhash64` expression
    // (simhash IS a per-document fold): it evaluates inside the scan's
    // project — no word explode, no 64-column aggregate buffer, no
    // per-doc groupBy exchange (the relational shape the oracle below
    // runs; SimHash64Spec asserts the two agree bit-for-bit).
    QueryDef(
      "q92_simhash_hamming", {
        val sums = (0 until 64).map(k =>
          s"SUM(CASE WHEN substr(h, ${k + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$k")
          .mkString(",\n        |    ")
        val packs = (0 until 4).map { j =>
          (0 until 16).map(k =>
            s"CASE WHEN s${16 * j + k} > 0 THEN ${1 << k} ELSE 0 END")
            .mkString("CAST(", " + ", s" AS BIGINT) AS b$j")
        }.mkString(",\n        |    ")
        val ham = (0 until 4).map(j =>
          s"bit_count(xor(a.b$j, b.b$j))").mkString(" + ")
        val keyCase = (0 until 4).map(j =>
          s"WHEN $j THEN b$j").mkString("CASE k ", " ", " END")
        s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |  FROM documents),
           |h AS (SELECT doc_id, sha256(w) AS h FROM w),
           |s AS (SELECT doc_id,
           |    $sums
           |  FROM h GROUP BY doc_id),
           |f AS (SELECT doc_id,
           |    $packs
           |  FROM s),
           |bands AS (SELECT doc_id, b0, b1, b2, b3, k, $keyCase AS key
           |  FROM f, (SELECT unnest(range(0,4)) AS k)),
           |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           |    $ham AS hamming
           |  FROM bands a JOIN bands b
           |    ON a.k = b.k AND a.key = b.key AND a.doc_id < b.doc_id)
           |SELECT CAST(hamming AS INTEGER) AS hamming, COUNT(*) AS n_pairs
           |FROM cand WHERE hamming <= 3 GROUP BY hamming ORDER BY hamming"""
          .stripMargin
      }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val bands = Tables(s, dir, "documents")
        .select(col("doc_id"), expr("simhash64(text)").as("f"))
        .select(col("doc_id"), col("f"),
          posexplode(col("f")).as(Seq("k", "key")))
        .repartition(col("doc_id"))
      val ham = (0 until 4).map(j =>
        expr(s"bit_count(element_at(fa, ${j + 1}) ^ " +
          s"element_at(fb, ${j + 1}))")).reduce(_ + _)
      bands.toDF("a_id", "fa", "k", "key")
        .join(bands.toDF("b_id", "fb", "k", "key"), Seq("k", "key"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), ham.as("hamming")).distinct()
        .filter(col("hamming") <= 3)
        .groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("hamming").cast("int").as("hamming"), col("n_pairs"))
        .orderBy("hamming")
    },

    // MinHash + LSH near-dup candidates — the scale path. 16 sha256-
    // window permutations over word 3-gram shingles (the oracle-portable
    // MinHashSha family), banded 4×4 with the band's literal
    // sub-signature as bucket key; pairs are generated only within
    // (band, key) buckets, then scored by signature agreement.
    // Exact-dedup runs FIRST (standard pipeline order): clusters of
    // byte-identical documents would otherwise produce quadratic
    // candidate pairs that near-dup detection cannot use — one
    // representative per exact-duplicate class suffices. Fully
    // hash-checked from round 6 (rows-only through round 5, when the
    // xxhash64 family had no SQL form).
    QueryDef(
      "q44_minhash_lsh_candidates",
      "WITH r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents " +
        "GROUP BY text),\n  " +
        lshPairsSql("r") + "\n" +
        s"""SELECT p.a_id, p.b_id, $estJaccardSql AS est_jaccard
           |FROM pairs p
           |JOIN sig sa ON sa.doc_id = p.a_id
           |JOIN sig sb ON sb.doc_id = p.b_id
           |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      lshCandidates(s, dir).orderBy("a_id", "b_id")
    },

    // Threshold-sensitivity sweep — the table a curator actually looks
    // at before committing to a near-dup cutoff: for each candidate
    // Jaccard threshold, how many edges survive, how many distinct
    // documents get flagged, and what fraction of the (exact-deduped)
    // corpus that is. One pass over the materialized candidate artifact
    // crossed with the 5-row threshold list — the sweep costs the same
    // as evaluating ONE threshold, which is the whole point of scoring
    // candidates once and thresholding later.
    QueryDef(
      "q151_threshold_sweep",
      "WITH r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents " +
        "GROUP BY text),\n  " +
        lshPairsSql("r") + ",\n" +
        s"""cand AS (SELECT p.a_id, p.b_id, $estJaccardSql AS ej
           |  FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a_id
           |  JOIN sig sb ON sb.doc_id = p.b_id),
           |th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS t),
           |e AS (SELECT t, a_id, b_id FROM cand, th WHERE ej >= t),
           |f AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_edges
           |  FROM e GROUP BY t),
           |fd AS (SELECT t, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
           |  FROM (SELECT t, a_id AS id FROM e
           |    UNION ALL SELECT t, b_id FROM e) u GROUP BY t),
           |tot AS (SELECT COUNT(*) AS n FROM r)
           |SELECT th.t AS threshold, COALESCE(f.n_edges, 0) AS n_edges,
           |  COALESCE(fd.n_docs, 0) AS n_docs_flagged,
           |  floor(COALESCE(fd.n_docs, 0) / CAST(tot.n AS DOUBLE)
           |    * 1000000) / 1000000.0 AS flagged_frac
           |FROM th LEFT JOIN f ON f.t = th.t
           |LEFT JOIN fd ON fd.t = th.t, tot
           |ORDER BY threshold""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cand = lshCandidates(s, dir)
      val th = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("t")
      val e = cand.crossJoin(broadcast(th))
        .filter(col("est_jaccard") >= col("t"))
        .pinned
      val f = e.groupBy("t").agg(count(lit(1)).as("n_edges"))
      val fd = e.select(col("t"), col("a_id").as("id"))
        .unionByName(e.select(col("t"), col("b_id").as("id")))
        .groupBy("t").agg(countDistinct(col("id")).as("n_docs_flagged"))
      val tot = broadcast(Tables(s, dir, "documents")
        .groupBy("text").agg(min(col("doc_id")))
        .agg(count(lit(1)).as("n")))
      th.join(f, Seq("t"), "left").join(fd, Seq("t"), "left")
        .crossJoin(tot)
        .select(col("t").as("threshold"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          coalesce(col("n_docs_flagged"), lit(0L)).as("n_docs_flagged"),
          (floor(coalesce(col("n_docs_flagged"), lit(0L))
            / col("n").cast("double") * 1000000) / 1000000.0)
            .as("flagged_frac"))
        .orderBy("threshold")
    },

    // MinHash SKETCH-ERROR audit — the table that justifies numPerms:
    // for every LSH candidate pair, the 16-perm signature-agreement
    // ESTIMATE against the exact shingle Jaccard, with per-pair error
    // and the corpus MAE (expected |err| ≈ sqrt(j(1-j)/16) ≈ 0.12 at
    // j=0.5 — a curator reads this before trusting threshold sweeps
    // like q151 built on the estimate). Both sides come from
    // materialized artifacts (candidates + distinct-shingle hashes);
    // the exact side is candidate-scoped — never the all-pairs truth
    // join. Integer-only outputs (agreement count, ppm by integer
    // division, 1-row-aggregate MAE) → hash-exact. The corpus MAE rides
    // the repo's broadcast-1-row crossJoin shape (q91/q146/q161), NOT an
    // empty-frame window: `OVER ()` funnels every candidate pair through
    // one task, which serializes at 10^8-pair LSH candidate sets.
    QueryDef(
      "q203_minhash_error",
      "WITH r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents " +
        "GROUP BY text),\n  " +
        lshPairsSql("r") + ",\n" +
        s"""est AS (SELECT p.a_id, p.b_id, $agreeCountSql AS n_agree
           |  FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a_id
           |  JOIN sig sb ON sb.doc_id = p.b_id),
           |td AS (SELECT doc_id, list_distinct($shingleListSql) AS sh
           |  FROM r WHERE len(string_split(text,' ')) >= 3),
           |ts AS (SELECT doc_id, unnest(sh) AS sh FROM td),
           |tc AS (SELECT doc_id, len(sh) AS n FROM td),
           |iv AS (SELECT e.a_id, e.b_id, COUNT(*) AS inter
           |  FROM est e
           |  JOIN ts a ON a.doc_id = e.a_id
           |  JOIN ts b ON b.doc_id = e.b_id AND b.sh = a.sh
           |  GROUP BY 1, 2),
           |j AS (SELECT e.a_id, e.b_id,
           |    CAST(e.n_agree AS BIGINT) AS n_agree,
           |    e.n_agree * 1000000 // 16 AS est_ppm,
           |    COALESCE(iv.inter, 0) * 1000000
           |      // (ca.n + cb.n - COALESCE(iv.inter, 0)) AS exact_ppm
           |  FROM est e
           |  LEFT JOIN iv ON iv.a_id = e.a_id AND iv.b_id = e.b_id
           |  JOIN tc ca ON ca.doc_id = e.a_id
           |  JOIN tc cb ON cb.doc_id = e.b_id),
           |e2 AS (SELECT a_id, b_id, n_agree,
           |    CAST(est_ppm AS BIGINT) AS est_ppm,
           |    CAST(exact_ppm AS BIGINT) AS exact_ppm,
           |    CAST(abs(est_ppm - exact_ppm) AS BIGINT) AS err_ppm
           |  FROM j),
           |m AS (SELECT SUM(err_ppm) // COUNT(*) AS mae_ppm FROM e2)
           |SELECT a_id, b_id, n_agree, est_ppm, exact_ppm, err_ppm,
           |  CAST(m.mae_ppm AS BIGINT) AS mae_ppm
           |FROM e2 CROSS JOIN m ORDER BY a_id, b_id""".stripMargin) {
      (s, dir) =>
      val cand = lshCandidates(s, dir)
        .select(col("a_id"), col("b_id"),
          round(col("est_jaccard") * 16).cast("long").as("n_agree"))
      val sh = distinctShingles(s, dir).toDF("doc_id", "h")
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand.select("a_id", "b_id")
        .join(sh.toDF("a_id", "h"), "a_id")
        .join(sh.toDF("b_id", "h"), Seq("b_id", "h"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      val scored = cand
        .join(inter, Seq("a_id", "b_id"), "left")
        .join(cnt.toDF("a_id", "na"), "a_id")
        .join(cnt.toDF("b_id", "nb"), "b_id")
        .withColumn("iv", coalesce(col("inter"), lit(0L)))
        .withColumn("est_ppm", expr("n_agree * 1000000 div 16"))
        .withColumn("exact_ppm",
          expr("iv * 1000000 div (na + nb - iv)"))
        .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
      val mae = broadcast(scored
        .agg(expr("sum(err_ppm) div count(*)").as("mae_ppm")))
      scored.crossJoin(mae)
        .select(col("a_id"), col("b_id"), col("n_agree"),
          col("est_ppm"), col("exact_ppm"), col("err_ppm"),
          col("mae_ppm"))
        .orderBy("a_id", "b_id")
    },

    // Near-dup CLUSTER resolution: candidate pairs are only half a dedup
    // pipeline — the corpus is clean only after connected components of
    // the near-dup graph resolve into groups with one representative
    // each (A~B, B~C must collapse to ONE doc even when A~C was never
    // scored). Verified against a DuckDB recursive-CTE transitive
    // closure on the capped q43 range.
    QueryDef(
      "q48_dedup_clusters",
      """WITH RECURSIVE
        |d AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' ||
        |         string_split(text,' ')[i+1] || ' ' ||
        |         string_split(text,' ')[i+2])) AS sh
        |  FROM documents
        |  WHERE doc_id < 30 AND len(string_split(text,' ')) >= 3),
        |s AS (SELECT doc_id, unnest(sh) AS sh FROM d),
        |c AS (SELECT doc_id, len(sh) AS n FROM d),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |j AS (SELECT a_id, b_id FROM p
        |      JOIN c ca ON ca.doc_id = a_id
        |      JOIN c cb ON cb.doc_id = b_id
        |      WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.7),
        |e AS (SELECT a_id AS src, b_id AS dst FROM j
        |      UNION SELECT b_id, a_id FROM j),
        |r AS (
        |  SELECT doc_id AS node, doc_id AS lbl FROM documents
        |  WHERE doc_id < 30
        |  UNION
        |  SELECT e.src AS node, r.lbl FROM r JOIN e ON e.dst = r.node)
        |SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster
        |FROM r GROUP BY node ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val edges = jaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.7).select("a_id", "b_id")
      val nodes = Tables(s, dir, "documents")
        .filter(col("doc_id") < 30).select("doc_id")
      connectedComponents(edges, nodes)
        .toDF("doc_id", "cluster").orderBy("doc_id")
    },

    // The full dedup pipeline end-to-end AT SCALE, over the whole corpus:
    // exact dedup reps → MinHash-LSH candidates → signature-estimated
    // jaccard filter → connected components → one representative per
    // near-dup cluster. Output: the keep-list with its cluster sizes
    // (exact-dup multiplicity folded back in). Hash-checked from round 7:
    // Spark's iterative min-label loop has no single-statement ANSI form,
    // but its FIXPOINT does — a recursive transitive-min closure (walk)
    // whose per-node MIN over reachable labels is exactly the converged
    // label; at oracle scale the near-dup graph is tiny, so the closure
    // is affordable in DuckDB. The candidate edges reuse q44's CTE chain
    // verbatim at the est_jaccard >= 0.5 threshold (a multiple of 1/16 —
    // binary-exact in both engines).
    QueryDef(
      "q49_neardup_reps",
      """WITH RECURSIVE
        |cls AS (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_exact, text
        |  FROM documents GROUP BY text),
        |r AS (SELECT doc_id, text FROM cls),
        |  """.stripMargin + lshPairsSql("r") + ",\n" +
        s"""j AS (SELECT p.a_id, p.b_id FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a_id
           |  JOIN sig sb ON sb.doc_id = p.b_id
           |  WHERE $estJaccardSql >= 0.5),
           |e AS (SELECT a_id AS src, b_id AS dst FROM j
           |  UNION SELECT b_id, a_id FROM j),
           |walk AS (
           |  SELECT doc_id AS node, doc_id AS lbl FROM cls
           |  UNION
           |  SELECT e.src AS node, walk.lbl FROM walk JOIN e ON e.dst = walk.node),
           |lab AS (SELECT node, MIN(lbl) AS cluster FROM walk GROUP BY node)
           |SELECT lab.cluster AS keep_id,
           |  COUNT(*) AS n_near_dup_classes,
           |  CAST(SUM(cls.n_exact) AS BIGINT) AS n_docs_total
           |FROM lab JOIN cls ON cls.doc_id = lab.node
           |GROUP BY 1 ORDER BY keep_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      // exact-dup classes: representative + multiplicity
      val classes = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_exact"))
      // the candidate edges are BY DEFINITION the q44 artifact filtered
      // at the estimate threshold: both run minhashLshCandidates over
      // the exact-dedup representatives (groupBy(text) → min doc_id), so
      // the near-dup graph comes from the materialized index instead of
      // a second signature+banding pass over the corpus
      val edges = lshCandidates(s, dir)
        .filter(col("est_jaccard") >= 0.5)
        .select("a_id", "b_id")
      val clusters = connectedComponents(
        edges, classes.select("doc_id"))
      // the component label IS the representative (min reachable doc_id)
      clusters.toDF("doc_id", "cluster")
        .join(classes.select("doc_id", "n_exact"), "doc_id")
        .groupBy(col("cluster").as("keep_id"))
        .agg(count(lit(1)).as("n_near_dup_classes"),
          sum(col("n_exact")).as("n_docs_total"))
        .orderBy("keep_id")
    },

    // LSH containment audit: does the q44 candidate set cover the
    // ground-truth near-dups? One row per FULL-CORPUS exact-Jaccard pair
    // >= 0.7 (truth is affordable uncapped — see jaccardPairs), `covered`
    // true iff LSH surfaced it (directly, or collapsed earlier by exact
    // dedup). Coverage tracks the 16x4 LSH s-curve (50% point j≈0.707);
    // DedupQualitySpec asserts the strata bounds. Registered so the
    // metric itself ships in the correctness artifact — fully
    // hash-checked from round 6: the oracle recomputes the truth side
    // (string shingles), the exact-dedup rep map, AND the whole sha-
    // window candidate pipeline.
    QueryDef(
      "q47_lsh_containment",
      s"""WITH td AS (SELECT doc_id, list_distinct($shingleListSql) AS sh
         |    FROM documents WHERE len(string_split(text,' ')) >= 3),
         |  ts AS (SELECT doc_id, unnest(sh) AS sh FROM td),
         |  tc AS (SELECT doc_id, len(sh) AS n FROM td),
         |  tp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |      COUNT(*) AS inter
         |    FROM ts a JOIN ts b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2),
         |  truth AS (SELECT a_id, b_id,
         |      CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
         |    FROM tp JOIN tc ca ON ca.doc_id = a_id
         |    JOIN tc cb ON cb.doc_id = b_id
         |    WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.7),
         |  reps AS (SELECT doc_id,
         |      MIN(doc_id) OVER (PARTITION BY text) AS rep
         |    FROM documents),
         |  r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
         |    GROUP BY text),
         |  """.stripMargin +
        lshPairsSql("r") + "\n" +
        """SELECT t.a_id, t.b_id, t.jaccard,
          |  (ra.rep = rb.rep OR p.a_id IS NOT NULL) AS covered
          |FROM truth t
          |JOIN reps ra ON ra.doc_id = t.a_id
          |JOIN reps rb ON rb.doc_id = t.b_id
          |LEFT JOIN pairs p ON p.a_id = least(ra.rep, rb.rep)
          |  AND p.b_id = greatest(ra.rep, rb.rep)
          |ORDER BY t.a_id, t.b_id""".stripMargin) { (s, dir) =>
      lshContainment(s, dir, minJaccard = 0.7)
    },

    // THE composed product: the full training-data preparation pipeline
    // in one plan — quality filter (q30's score) → exact dedup (q40) →
    // MinHash-LSH near-dup resolution to one representative per cluster
    // (q44/q48/q49) → content-addressed train/val/test split (q36) —
    // reported as per-split corpus accounting. Hash-checked from round 7
    // by COMPOSING the stages' oracle fragments: the quality score is the
    // identical double-expression tree in both engines (same op order →
    // bit-identical IEEE results, so the 0.2 threshold agrees); the edges
    // are q44's CTE chain over FULL-corpus reps semi-joined to quality
    // survivors (valid because the quality floor is a pure function of
    // text — classes pass atomically and keep their reps, see
    // [[trainingKeepListIndexed]]); component resolution is q49's
    // recursive transitive-min closure; the split is the same sha256
    // prefix rule (lowercase hex in both engines).
    QueryDef(
      "q67_training_pipeline",
      s"""WITH RECURSIVE
         |qcls AS (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_exact
         |  FROM documents WHERE $qualitySql >= 0.2 GROUP BY text),
         |r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
         |  GROUP BY text),
         |  """.stripMargin + lshPairsSql("r") + ",\n" +
        s"""j AS (SELECT p.a_id, p.b_id FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a_id
           |  JOIN sig sb ON sb.doc_id = p.b_id
           |  WHERE $estJaccardSql >= 0.5
           |    AND p.a_id IN (SELECT doc_id FROM qcls)
           |    AND p.b_id IN (SELECT doc_id FROM qcls)),
           |e AS (SELECT a_id AS src, b_id AS dst FROM j
           |  UNION SELECT b_id, a_id FROM j),
           |walk AS (
           |  SELECT doc_id AS node, doc_id AS lbl FROM qcls
           |  UNION
           |  SELECT e.src AS node, walk.lbl FROM walk JOIN e ON e.dst = walk.node),
           |lab AS (SELECT node, MIN(lbl) AS cluster FROM walk GROUP BY node),
           |keep AS (SELECT qcls.doc_id, qcls.n_exact,
           |    sha256('split-v1|' || CAST(qcls.doc_id AS VARCHAR)) AS h
           |  FROM lab JOIN qcls ON qcls.doc_id = lab.node
           |  WHERE lab.node = lab.cluster)
           |SELECT CASE WHEN substr(h, 1, 2) < 'cd' THEN 'train'
           |            WHEN substr(h, 1, 2) < 'e6' THEN 'val' ELSE 'test'
           |       END AS split,
           |  COUNT(*) AS n_docs,
           |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           |  CAST(SUM(n_exact) AS BIGINT) AS n_source_docs
           |FROM keep GROUP BY 1 ORDER BY split""".stripMargin) { (s, dir) =>
      val kept = trainingKeepListIndexed(s, dir, minQuality = 0.2)
      kept
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).cast("long").as("min_doc_id"),
          sum(col("n_exact")).as("n_source_docs"))
        .orderBy("split")
    },

    // INCREMENTAL delta-dedup — the daily-ingest shape: a NEW batch
    // (doc_id % 10 = 9 stands in for today's arrivals) deduplicates
    // against the EXISTING corpus without rescanning it, by probing a
    // materialized BAND INDEX ([[corpusBandIndex]] — one row per
    // (band, key) per corpus exact-rep, carrying the rep's signature).
    // Per new doc: 'exact' (verbatim text already in the corpus),
    // 'near' (>= 1 corpus rep shares a band bucket at est_jaccard >=
    // 0.5), else 'novel', plus the near-match count. At 100 TB the
    // corpus side is the index artifact (built once per corpus
    // version); the batch side computes signatures row-locally and the
    // probe joins are batch-sized — ingest cost scales with the DAY,
    // not the CORPUS. The streaming twin (StreamingDedup.nearDupFlags)
    // is spec-pinned; this registers the batch form on the oracle
    // surface, where DuckDB recomputes both sides' signature chains
    // cross-set.
    QueryDef(
      "q133_incremental_dedup",
      """WITH cr AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
        |  WHERE doc_id % 10 <> 9 GROUP BY text),
        |nb AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 9),
        |  """.stripMargin +
        sigBandsSql("cr", "c") + ",\n  " + sigBandsSql("nb", "n") + ",\n" +
        s"""cand AS (SELECT DISTINCT n.doc_id AS n_id, c.doc_id AS c_id
           |  FROM bandsn n JOIN bandsc c ON n.k = c.k AND n.bh = c.bh),
           |near AS (SELECT n_id, COUNT(*) AS n FROM cand
           |  JOIN sign sa ON sa.doc_id = cand.n_id
           |  JOIN sigc sb ON sb.doc_id = cand.c_id
           |  WHERE $estJaccardSql >= 0.5 GROUP BY n_id),
           |ex AS (SELECT DISTINCT nb.doc_id FROM nb
           |  JOIN cr ON cr.text = nb.text)
           |SELECT nb.doc_id,
           |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
           |       WHEN COALESCE(near.n, 0) > 0 THEN 'near'
           |       ELSE 'novel' END AS verdict,
           |  CAST(COALESCE(near.n, 0) AS BIGINT) AS n_near
           |FROM nb LEFT JOIN ex ON ex.doc_id = nb.doc_id
           |LEFT JOIN near ON near.n_id = nb.doc_id
           |ORDER BY nb.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val newB = docs.filter(col("doc_id") % 10 === 9)
        .select("doc_id", "text")
      // exact tier: the (small) new batch broadcasts; the corpus scans
      // once with the equi-join key pushed to the probe
      val exactIds = docs.filter(col("doc_id") % 10 =!= 9)
        .select("text")
        .join(broadcast(newB), "text")
        .select("doc_id").distinct()
        .withColumn("is_exact", lit(true))
      val newBands = bandBuckets(minhashSigs(newB), numPerms = 16,
          bands = 4)
        .select(col("doc_id").as("n_id"), col("sig").as("n_sig"),
          col("band"), col("bh"))
      val near = newBands
        .join(corpusBandIndex(s, dir)
          .toDF("c_id", "c_sig", "band", "bh"), Seq("band", "bh"))
        .select(col("n_id"), col("c_id"),
          expr("cast(size(filter(zip_with(n_sig, c_sig, " +
            "(x, y) -> x = y), e -> e)) as double) / size(n_sig)")
            .as("est"))
        .distinct()
        .filter(col("est") >= 0.5)
        .groupBy("n_id").agg(count(lit(1)).as("n_near"))
      newB.select("doc_id")
        .join(exactIds, Seq("doc_id"), "left")
        .join(near.toDF("doc_id", "n_near"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(coalesce(col("is_exact"), lit(false)), "exact")
            .when(coalesce(col("n_near"), lit(0L)) > 0, "near")
            .otherwise("novel").as("verdict"),
          coalesce(col("n_near"), lit(0L)).as("n_near"))
        .orderBy("doc_id")
    },

    // The dedup FUNNEL — the per-stage accounting table every dataset
    // paper publishes (docs and tokens surviving each tier): raw corpus
    // → exact dedup (one rep per byte-identical class) → near-dup
    // resolution (one rep per LSH/CC cluster) → span-level cut (the
    // q127 rewrite applied to the keepers). Each tier reuses its
    // oracle-pinned machinery (q40's classes, q44's candidate artifact,
    // q49's closure, q127's span artifacts); this query pins the
    // COMPOSED accounting, token counts by the ''-safe word filter so
    // fully-cut documents count 0, not 1. The funnel is the engine's
    // answer to "what did dedup actually cost us?" — and the oracle
    // recomputes all four tiers from raw documents in one statement.
    QueryDef(
      "q138_dedup_funnel", {
        def tk(x: String) =
          s"len(list_filter(string_split($x, ' '), w -> w <> ''))"
        """WITH RECURSIVE
          |cls AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
          |  GROUP BY text),
          |r AS (SELECT doc_id, text FROM cls),
          |  """.stripMargin + lshPairsSql("r") + ",\n" +
          s"""j AS (SELECT p.a_id, p.b_id FROM pairs p
             |  JOIN sig sa ON sa.doc_id = p.a_id
             |  JOIN sig sb ON sb.doc_id = p.b_id
             |  WHERE $estJaccardSql >= 0.5),
             |e AS (SELECT a_id AS src, b_id AS dst FROM j
             |  UNION SELECT b_id, a_id FROM j),
             |walk AS (
             |  SELECT doc_id AS node, doc_id AS lbl FROM cls
             |  UNION
             |  SELECT e.src AS node, walk.lbl FROM walk
             |    JOIN e ON e.dst = walk.node),
             |lab AS (SELECT node, MIN(lbl) AS cluster FROM walk
             |  GROUP BY node),
             |keepers AS (SELECT node AS doc_id FROM lab
             |  WHERE node = cluster),
             |dd AS (SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents),
             |gg AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
             |    array_to_string(list_slice(w, i, i + 9), ' ') AS sh
             |  FROM dd, unnest(range(1, len(w) - 8)) AS t(i)),
             |rg AS (SELECT sh FROM gg GROUP BY sh
             |  HAVING COUNT(DISTINCT doc_id) >= 2),
             |mm AS (SELECT gg.doc_id, gg.pos, gg.sh FROM gg
             |  JOIN rg USING (sh)),
             |frst AS (SELECT doc_id, pos FROM (
             |    SELECT doc_id, pos, ROW_NUMBER() OVER (
             |      PARTITION BY sh ORDER BY doc_id, pos) AS rn
             |    FROM mm) t WHERE rn = 1),
             |cov AS (SELECT DISTINCT doc_id, pos + k AS idx
             |  FROM mm, unnest(range(0, 10)) AS t(k)),
             |prot AS (SELECT DISTINCT doc_id, pos + k AS idx
             |  FROM frst, unnest(range(0, 10)) AS t(k)),
             |cutx AS (SELECT cov.doc_id, cov.idx FROM cov
             |  ANTI JOIN prot ON prot.doc_id = cov.doc_id
             |    AND prot.idx = cov.idx),
             |wi AS (SELECT doc_id, CAST(i AS INTEGER) AS i, w[i] AS word
             |  FROM dd, unnest(range(1, len(w) + 1)) AS t(i)),
             |keepw AS (SELECT wi.doc_id, wi.i, wi.word FROM wi
             |  ANTI JOIN cutx ON cutx.doc_id = wi.doc_id
             |    AND cutx.idx = wi.i),
             |clean AS (SELECT doc_id,
             |    string_agg(word, ' ' ORDER BY i) AS ct
             |  FROM keepw GROUP BY doc_id),
             |s0 AS (SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
             |  CAST(SUM(${tk("text")}) AS BIGINT) AS n_tokens
             |  FROM documents),
             |s1 AS (SELECT '1_exact' AS stage, COUNT(*) AS n_docs,
             |  CAST(SUM(${tk("text")}) AS BIGINT) AS n_tokens FROM cls),
             |s2 AS (SELECT '2_near' AS stage, COUNT(*) AS n_docs,
             |  CAST(SUM(${tk("cls.text")}) AS BIGINT) AS n_tokens
             |  FROM keepers JOIN cls USING (doc_id)),
             |s3 AS (SELECT '3_span_cut' AS stage, COUNT(*) AS n_docs,
             |  CAST(SUM(${tk("COALESCE(clean.ct, '')")}) AS BIGINT)
             |    AS n_tokens
             |  FROM keepers LEFT JOIN clean USING (doc_id))
             |SELECT * FROM s0 UNION ALL SELECT * FROM s1
             |UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
             |ORDER BY stage""".stripMargin
      }) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      def tok(c: String) = expr(
        s"cast(size(filter(split($c, ' '), w -> w != '')) as long)")
      def stageOf(name: String, df: DataFrame, textCol: String) =
        df.agg(count(lit(1)).as("n_docs"),
            sum(tok(textCol)).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      val classes = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      val edges = lshCandidates(s, dir)
        .filter(col("est_jaccard") >= 0.5).select("a_id", "b_id")
      val keepers = connectedComponents(edges, classes.select("doc_id"))
        .toDF("doc_id", "cluster")
        .filter(col("doc_id") === col("cluster")).select("doc_id")
      stageOf("0_raw", docs, "text")
        .unionByName(stageOf("1_exact", classes, "text"))
        .unionByName(stageOf("2_near", keepers.join(classes, "doc_id"),
          "text"))
        .unionByName(stageOf("3_span_cut",
          keepers.join(spanCutCorpus(s, dir), "doc_id"), "clean_text"))
        .orderBy("stage")
    },

    // Incremental INDEX MAINTENANCE — the band index as a LIVE TABLE
    // instead of a per-corpus-version rebuild: the LSH index lives in a
    // [[graft.engine.ManifestTableStore]] and each ingest batch APPENDS
    // only its novel texts' band rows (batch 0 = the corpus slice's
    // exact-reps; batch 1 = the delta slice's reps anti-joined against
    // already-indexed texts — first arrival wins, the ingest-order
    // semantics). At 100 TB this is the difference between re-banding
    // the corpus per version and appending a day's rows: index
    // maintenance cost scales with the DAY, queries read committed
    // index state (with the store's time travel / CDF for free — an
    // index consumer can process only the newly indexed rows). The
    // oracle recomputes the maintained state's per-band profile from
    // raw documents with the same first-arrival rep rule;
    // PipelineInvariantsSpec pins structural laws + append idempotency.
    QueryDef(
      "q135_index_maintenance",
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 10 <> 9),
        |creps AS (SELECT MIN(doc_id) AS doc_id, text FROM corpus
        |  GROUP BY text),
        |novel AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
        |  WHERE doc_id % 10 = 9
        |    AND text NOT IN (SELECT text FROM corpus)
        |  GROUP BY text),
        |u AS (SELECT doc_id, text FROM creps
        |  UNION ALL SELECT doc_id, text FROM novel),
        |  """.stripMargin + sigBandsSql("u", "u") + "\n" +
        """SELECT CAST(k AS INTEGER) AS band, COUNT(*) AS n_entries,
          |  COUNT(DISTINCT bh) AS n_keys,
          |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
          |FROM bandsu GROUP BY k ORDER BY band""".stripMargin) {
      (s, dir) =>
      maintainedBandIndex(s, dir).read(s)
        .groupBy("band")
        .agg(count(lit(1)).as("n_entries"),
          countDistinct(col("bh")).as("n_keys"),
          min(col("doc_id")).cast("long").as("first_doc"))
        .orderBy("band")
    },

    // Split-LEAKAGE audit — the eval-integrity property the q67
    // pipeline exists to guarantee, measured instead of assumed: for
    // every near-dup candidate edge among quality-surviving classes,
    // compare (a) the splits a NAIVE per-document content-addressed
    // assignment would give its two ends — near-dups routinely straddle
    // train/test under naive hashing, which is eval leakage — against
    // (b) the pipeline's assignment, where every member inherits its
    // cluster representative's split, so an edge's two ends agree BY
    // CONSTRUCTION (an est>=0.5 edge is exactly what connects a
    // component). Output: per (naive_split_a, naive_split_b) pair-count
    // plus the pipeline's cross-split count, which must be zero in
    // every row — the hash check pins both the leak counts and the
    // zero. Scale shape: edges come from the materialized q44 artifact
    // semi-joined to survivors; labels from the graph-bounded CC loop;
    // the audit itself is one edge-sized aggregate.
    QueryDef(
      "q132_split_leakage_audit",
      s"""WITH RECURSIVE
         |qcls AS (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_exact
         |  FROM documents WHERE $qualitySql >= 0.2 GROUP BY text),
         |r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
         |  GROUP BY text),
         |  """.stripMargin + lshPairsSql("r") + ",\n" +
        s"""j AS (SELECT p.a_id, p.b_id FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a_id
           |  JOIN sig sb ON sb.doc_id = p.b_id
           |  WHERE $estJaccardSql >= 0.5
           |    AND p.a_id IN (SELECT doc_id FROM qcls)
           |    AND p.b_id IN (SELECT doc_id FROM qcls)),
           |e AS (SELECT a_id AS src, b_id AS dst FROM j
           |  UNION SELECT b_id, a_id FROM j),
           |walk AS (
           |  SELECT doc_id AS node, doc_id AS lbl FROM qcls
           |  UNION
           |  SELECT e.src AS node, walk.lbl FROM walk JOIN e ON e.dst = walk.node),
           |lab AS (SELECT node, MIN(lbl) AS cluster FROM walk GROUP BY node)
           |SELECT ${splitSql("j.a_id")} AS naive_split_a,
           |  ${splitSql("j.b_id")} AS naive_split_b,
           |  COUNT(*) AS n_pairs,
           |  CAST(SUM(CASE WHEN ${splitSql("la.cluster")}
           |      <> ${splitSql("lb.cluster")} THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_pipeline_cross
           |FROM j JOIN lab la ON la.node = j.a_id
           |JOIN lab lb ON lb.node = j.b_id
           |GROUP BY 1, 2 ORDER BY naive_split_a, naive_split_b"""
          .stripMargin) { (s, dir) =>
      def split(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val h = sha2(concat(lit("split-v1|"), c.cast("string")), 256)
        when(substring(h, 1, 2) < "cd", "train")
          .when(substring(h, 1, 2) < "e6", "val").otherwise("test")
      }
      val classes = qualityClasses(Tables(s, dir, "documents"), 0.2)
      val ids = classes.select("doc_id")
      val edges = lshCandidates(s, dir)
        .filter(col("est_jaccard") >= 0.5)
        .join(ids.toDF("a_id"), Seq("a_id"), "left_semi")
        .join(ids.toDF("b_id"), Seq("b_id"), "left_semi")
        .select("a_id", "b_id")
      val labels = connectedComponents(edges, ids)
      edges
        .join(labels.toDF("a_id", "lbl_a"), "a_id")
        .join(labels.toDF("b_id", "lbl_b"), "b_id")
        .select(split(col("a_id")).as("naive_split_a"),
          split(col("b_id")).as("naive_split_b"),
          (split(col("lbl_a")) =!= split(col("lbl_b"))).as("pipe_cross"))
        .groupBy("naive_split_a", "naive_split_b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("pipe_cross"), 1L).otherwise(0L))
            .as("n_pipeline_cross"))
        .orderBy("naive_split_a", "naive_split_b")
    },

    // SPAN-level repeated-region detection — the Lee et al. ("Dedup-
    // licating Training Data Makes Language Models Better") exact-
    // substring tier that document- and segment-level dedup both miss:
    // a span repeated VERBATIM across documents (license header, nav
    // boilerplate, quoted passage) at ANY word offset, not just q99's
    // fixed 10-word chunk boundaries. Position p of a doc "repeats"
    // when the word-10-gram starting at p occurs in >= 2 distinct
    // documents; consecutive repeating positions merge into one cut
    // span (gaps-and-islands: pos - row_number is constant within a
    // run). Output: one row per maximal span — (doc, start, end word
    // position, gram count, span width) — the cut-list a span-dedup
    // pass consumes. Scale shape: the gram frame is a row-local
    // generator evaluated twice (frequency pass + position pass — two
    // fused scans beat exchanging a corpus×10-words intermediate,
    // PERF.md finding 13); the repeated-gram set joins back as a
    // left-semi (AQE broadcasts it when boilerplate-sized); the window
    // partitions by doc — no global sort.
    QueryDef(
      "q125_repeated_spans",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    array_to_string(list_slice(w, i, i + 9), ' ') AS sh
        |  FROM d, unnest(range(1, len(w) - 8)) AS t(i)),
        |r AS (SELECT sh FROM g GROUP BY sh
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |m AS (SELECT g.doc_id, g.pos FROM g JOIN r USING (sh)),
        |i AS (SELECT doc_id, pos,
        |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS grp
        |  FROM m)
        |SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS start_pos,
        |  CAST(MAX(pos) AS INTEGER) AS end_pos,
        |  COUNT(*) AS n_grams,
        |  CAST(MAX(pos) - MIN(pos) + 10 AS INTEGER) AS span_words
        |FROM i GROUP BY doc_id, grp
        |ORDER BY doc_id, start_pos""".stripMargin) { (s, dir) =>
      repeatedSpans(s, dir).orderBy("doc_id", "start_pos")
    },

    // SPAN-CUTTING rewrite — the consumer the q125 cut-list exists for
    // (the second half of Lee et al.'s exact-substring dedup): emit the
    // cleaned corpus with every repeated span removed EXCEPT its
    // corpus-wide first occurrence. A word index is cut iff it is
    // covered by a repeated span (the q125 artifact, positions
    // start..end+9) and NOT covered by any gram whose corpus-first
    // occurrence (min doc_id, then min pos) lives at that index — so the
    // canonical copy of every repeated region survives verbatim (its
    // protected index range is contiguous, hence still adjacent after
    // splicing) and every later copy is excised. Scale shape: both span
    // tables are boilerplate-sized Materialize artifacts; the expanded
    // index sets join on (doc_id, idx); the only corpus-wide work is one
    // broadcast-able left join of docs against per-doc cut arrays and a
    // row-local filter+array_join rebuild. DedupQualitySpec pins the
    // laws (first occurrences retained contiguously; no cross-doc
    // repeated 10-gram remains on a splice-free fixture).
    QueryDef(
      "q127_span_cut",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    array_to_string(list_slice(w, i, i + 9), ' ') AS sh
        |  FROM d, unnest(range(1, len(w) - 8)) AS t(i)),
        |r AS (SELECT sh FROM g GROUP BY sh
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |m AS (SELECT g.doc_id, g.pos, g.sh FROM g JOIN r USING (sh)),
        |frst AS (SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      ROW_NUMBER() OVER (PARTITION BY sh ORDER BY doc_id, pos)
        |        AS rn
        |    FROM m) t WHERE rn = 1),
        |cov AS (SELECT DISTINCT doc_id, pos + k AS idx
        |  FROM m, unnest(range(0, 10)) AS t(k)),
        |prot AS (SELECT DISTINCT doc_id, pos + k AS idx
        |  FROM frst, unnest(range(0, 10)) AS t(k)),
        |cut AS (SELECT cov.doc_id, cov.idx FROM cov
        |  ANTI JOIN prot ON prot.doc_id = cov.doc_id
        |    AND prot.idx = cov.idx),
        |wi AS (SELECT doc_id, CAST(i AS INTEGER) AS i, w[i] AS word
        |  FROM d, unnest(range(1, len(w) + 1)) AS t(i)),
        |keepw AS (SELECT wi.doc_id, wi.i, wi.word FROM wi
        |  ANTI JOIN cut ON cut.doc_id = wi.doc_id AND cut.idx = wi.i),
        |clean AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i)
        |    AS clean_text
        |  FROM keepw GROUP BY doc_id),
        |nc AS (SELECT doc_id, COUNT(*) AS n FROM cut GROUP BY doc_id)
        |SELECT d.doc_id AS doc_id,
        |  COALESCE(clean.clean_text, '') AS clean_text,
        |  CAST(COALESCE(nc.n, 0) AS INTEGER) AS n_cut
        |FROM d LEFT JOIN clean ON clean.doc_id = d.doc_id
        |LEFT JOIN nc ON nc.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      spanCutCorpus(s, dir).orderBy("doc_id")
    },

    // Blocked multi-pass sorted-neighborhood entity resolution — the
    // scale path q63's scaladoc promises for character-level fuzzy
    // matching (Hernández & Stolfo's sorted-neighborhood method, the
    // classic record-linkage blocking scheme): sort each pass's records
    // by a key, compare only rank-neighbors within a window, union the
    // passes (two keys — the prefix and its reversal — so a pair
    // diverging at the front of the string still sorts adjacent in the
    // second pass). Expensive Levenshtein runs on O(n·w·passes)
    // candidate pairs, never O(n²). Scale shape: ranks are computed
    // PER 2-char BLOCK (partitionBy block — no global sort/single-
    // partition window), and the rank-window join is an EQUI-join on
    // (block, rank + offset) via a 1..w offset explode — shuffle-hash,
    // linear. At 100 TB the block key doubles as the partition key of
    // the sorted layout, so each pass is one partition-local window +
    // one co-partitioned join.
    QueryDef(
      "q158_sorted_neighborhood",
      """WITH d AS (SELECT doc_id, substr(text, 1, 80) AS p
        |  FROM documents),
        |s1 AS (SELECT doc_id, substr(p, 1, 2) AS blk,
        |    ROW_NUMBER() OVER (PARTITION BY substr(p, 1, 2)
        |      ORDER BY p, doc_id) AS rk FROM d),
        |p1 AS (SELECT LEAST(a.doc_id, b.doc_id) AS a_id,
        |    GREATEST(a.doc_id, b.doc_id) AS b_id
        |  FROM s1 a JOIN s1 b ON b.blk = a.blk
        |    AND b.rk > a.rk AND b.rk <= a.rk + 10),
        |s2 AS (SELECT doc_id, substr(reverse(p), 1, 2) AS blk,
        |    ROW_NUMBER() OVER (PARTITION BY substr(reverse(p), 1, 2)
        |      ORDER BY reverse(p), doc_id) AS rk FROM d),
        |p2 AS (SELECT LEAST(a.doc_id, b.doc_id) AS a_id,
        |    GREATEST(a.doc_id, b.doc_id) AS b_id
        |  FROM s2 a JOIN s2 b ON b.blk = a.blk
        |    AND b.rk > a.rk AND b.rk <= a.rk + 10),
        |cand AS (SELECT DISTINCT a_id, b_id FROM
        |  (SELECT * FROM p1 UNION ALL SELECT * FROM p2) u)
        |SELECT c.a_id, c.b_id,
        |  CAST(levenshtein(da.p, db.p) AS INTEGER) AS dist
        |FROM cand c JOIN d da ON da.doc_id = c.a_id
        |JOIN d db ON db.doc_id = c.b_id
        |WHERE levenshtein(da.p, db.p) <= 40
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 80).as("p"))
      def pass(key: Column): DataFrame = {
        val ranked = d.select(col("doc_id"), key.as("k"))
          .withColumn("blk", substring(col("k"), 1, 2))
          .withColumn("rk", row_number().over(
            Window.partitionBy("blk").orderBy(col("k"), col("doc_id"))))
          .select("blk", "rk", "doc_id")
        val probes = ranked.select(col("blk"), col("doc_id").as("x_id"),
          col("rk"), explode(sequence(lit(1), lit(10))).as("off"))
          .select(col("blk"), col("x_id"),
            (col("rk") + col("off")).as("rk"))
        probes.join(ranked, Seq("blk", "rk"))
          .select(least(col("x_id"), col("doc_id")).as("a_id"),
            greatest(col("x_id"), col("doc_id")).as("b_id"))
      }
      // AQE coalesces the distinct's skinny 91k-row exchange output to ONE
      // partition (bytes-based), which would run every verification
      // Levenshtein on a single core — the q63 lesson again. Spread the
      // candidate set first; the per-pair DP is the cost, not the
      // shuffle. Width = the session's shuffle parallelism (a literal
      // would cap the dominant CPU stage at that many tasks
      // cluster-wide). ROUND-ROBIN, not hash-on-(a_id,b_id): a hash
      // repartition on the distinct's own keys is partitioning-
      // equivalent to the aggregate's exchange, so EnsureRequirements
      // drops it and AQE coalesces the surviving ENSURE_REQUIREMENTS
      // exchange right back to 1 (measured: the whole DP stage on one
      // core, 4.9 s vs 0.3 s). REPARTITION_BY_NUM survives both rules.
      pass(col("p")).union(pass(reverse(col("p")))).distinct()
        .repartition(s.sessionState.conf.numShufflePartitions)
        .join(d.toDF("a_id", "pa"), "a_id")
        .join(d.toDF("b_id", "pb"), "b_id")
        .select(col("a_id"), col("b_id"),
          levenshtein(col("pa"), col("pb")).cast("int").as("dist"))
        .filter(col("dist") <= 40)
        .orderBy("a_id", "b_id")
    },

    // SimHash-BLOCKED edit distance — the OTHER scale path q63's
    // scaladoc promises ("block by SimHash/LSH bucket first and run
    // this only within buckets"), now kept: candidates are q92's
    // banded-fingerprint pairs AT ITS VERDICT POINT (band equality +
    // hamming ≤ 3 over the full 64-bit fingerprint — integer xor/
    // popcount, cheap), and the expensive Levenshtein runs only on
    // them. The hamming gate is load-bearing: on this low-vocabulary
    // corpus band equality alone admits 573k pairs at sf0.1, hamming≤3
    // admits 897 — the block's job is fingerprint-CLOSE pairs, the DP's
    // job is the character-level verdict. Complementary to q158's
    // sorted-neighborhood key: that catches shared prefixes/suffixes,
    // this catches token-content similarity at any offset. Same
    // finding-41 spread before the per-pair DP.
    QueryDef(
      "q170_blocked_edit_distance", {
        val sums = (0 until 64).map(k =>
          s"SUM(CASE WHEN substr(h, ${k + 1}, 1) >= '8' THEN 1 ELSE -1 " +
            s"END) AS s$k")
          .mkString(",\n        |    ")
        val packs = (0 until 4).map { j =>
          (0 until 16).map(k =>
            s"CASE WHEN s${16 * j + k} > 0 THEN ${1 << k} ELSE 0 END")
            .mkString("CAST(", " + ", s" AS BIGINT) AS b$j")
        }.mkString(",\n        |    ")
        val keyCase = (0 until 4).map(j =>
          s"WHEN $j THEN b$j").mkString("CASE k ", " ", " END")
        val ham = (0 until 4).map(j =>
          s"bit_count(xor(a.b$j, b.b$j))").mkString(" + ")
        s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |  FROM documents),
           |h AS (SELECT doc_id, sha256(w) AS h FROM w),
           |s AS (SELECT doc_id,
           |    $sums
           |  FROM h GROUP BY doc_id),
           |f AS (SELECT doc_id,
           |    $packs
           |  FROM s),
           |bands AS (SELECT doc_id, b0, b1, b2, b3, k, $keyCase AS key
           |  FROM f, (SELECT unnest(range(0,4)) AS k)),
           |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           |    $ham AS hamming
           |  FROM bands a JOIN bands b
           |    ON a.k = b.k AND a.key = b.key AND a.doc_id < b.doc_id),
           |d AS (SELECT doc_id, substr(text, 1, 80) AS p FROM documents)
           |SELECT c.a_id, c.b_id, CAST(c.hamming AS INTEGER) AS hamming,
           |  CAST(levenshtein(da.p, db.p) AS INTEGER) AS dist
           |FROM cand c JOIN d da ON da.doc_id = c.a_id
           |JOIN d db ON db.doc_id = c.b_id
           |WHERE c.hamming <= 3 AND levenshtein(da.p, db.p) <= 40
           |ORDER BY a_id, b_id""".stripMargin
      }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val bands = Tables(s, dir, "documents")
        .select(col("doc_id"), expr("simhash64(text)").as("f"))
        .select(col("doc_id"), col("f"),
          posexplode(col("f")).as(Seq("k", "key")))
        .repartition(col("doc_id"))
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 80).as("p"))
      val ham = (0 until 4).map(j =>
        expr(s"bit_count(element_at(fa, ${j + 1}) ^ " +
          s"element_at(fb, ${j + 1}))")).reduce(_ + _)
      bands.toDF("a_id", "fa", "k", "key")
        .join(bands.toDF("b_id", "fb", "k", "key"), Seq("k", "key"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), ham.as("hamming")).distinct()
        .filter(col("hamming") <= 3)
        // finding-41 spread, width from conf, round-robin so it cannot
        // collapse into the distinct's exchange (see q158's comment)
        .repartition(s.sessionState.conf.numShufflePartitions)
        .join(d.toDF("a_id", "pa"), "a_id")
        .join(d.toDF("b_id", "pb"), "b_id")
        .select(col("a_id"), col("b_id"),
          col("hamming").cast("int").as("hamming"),
          levenshtein(col("pa"), col("pb")).cast("int").as("dist"))
        .filter(col("dist") <= 40)
        .orderBy("a_id", "b_id")
    },

    // RECURSIVE reachability over the near-dup candidate graph —
    // Spark 4's `WITH RECURSIVE` executing the SAME recursion text the
    // DuckDB oracle runs (the q48/q49 min-label loops iterate in Scala;
    // this one recurses in SQL on BOTH engines — the first time the
    // engine's own recursion is on the oracle surface). Seed = the
    // highest-degree node (ties → lowest id); BFS with a depth bound of
    // 6 over the undirected edge set, min depth per reached doc — "how
    // far does this document's duplication neighborhood extend, and
    // through how many hops": the provenance question a curator asks
    // about a contaminated doc. Spark recursion is UNION ALL + bound
    // (UNION-dedup recursion is not supported yet); path multiplicity
    // is bounded because exact dedup runs before LSH, so clusters are
    // small — the depth bound caps blowup on any pathological clique.
    QueryDef(
      "q171_recursive_reach",
      "WITH RECURSIVE r AS (SELECT MIN(doc_id) AS doc_id, text " +
        "FROM documents GROUP BY text),\n  " +
        lshPairsSql("r") + ",\n  " +
        "dup_edges AS (SELECT a_id, b_id FROM pairs),\n" +
        reachRecursionSql) { (s, dir) =>
      // the recursion re-reads dup_edges EVERY iteration (seed + 6
      // depth steps) — pin the artifact read once so each step scans
      // executor-local blocks instead of re-opening the parquet scan
      import graft.engine.Pin.Pinnable
      lshCandidates(s, dir).select("a_id", "b_id").pinned
        .createOrReplaceTempView("dup_edges")
      // the recursion's frontier is cluster-sized by construction
      // (exact dedup precedes LSH), so each of the ~7 iteration steps
      // shuffles a handful of rows: a fixed tiny partition count and
      // no per-step AQE re-planning beat machine-wide exchanges
      // (guide §2.2 — partition counts sized to the step's
      // CARDINALITY, not to the machine; scale-independent because
      // the frontier, not the corpus, sets that cardinality). Confs
      // are lazily read at execution: force the recursion inside the
      // window (pin — the reach set is frontier-sized) and restore.
      val conf = s.conf
      val prev = Seq("spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled").map(k => k -> conf.get(k))
      try {
        conf.set("spark.sql.shuffle.partitions", "4")
        conf.set("spark.sql.adaptive.enabled", "false")
        s.sql("WITH RECURSIVE " + reachRecursionSql).pinned
      } finally prev.foreach { case (k, v) => conf.set(k, v) }
    },

    // Triangle census of the near-dup graph — see [[triangleSql]]: both
    // engines run the SAME text (Spark over the materialized candidate
    // artifact as a view, DuckDB over the q44 oracle chain), reporting
    // edges/nodes/triangles/wedges and the global clustering
    // coefficient. On a healthy dedup graph this reads near-cliquey
    // (near-dup is almost transitive); a low coefficient flags a
    // candidate generator whose edges contradict each other.
    QueryDef(
      "q186_dup_graph_triangles",
      "WITH r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents " +
        "GROUP BY text),\n  " +
        lshPairsSql("r") + ",\n  " +
        "dup_edges AS (SELECT a_id, b_id FROM pairs),\n" +
        triangleSql) { (s, dir) =>
      // the triangle census scans dup_edges three ways (two wedge legs
      // + the closure probe) — pin the artifact read once (see q171)
      import graft.engine.Pin.Pinnable
      lshCandidates(s, dir).select("a_id", "b_id").pinned
        .createOrReplaceTempView("dup_edges")
      s.sql("WITH " + triangleSql)
    },

    // QUALITY-AWARE cluster representatives — the keeper-policy
    // refinement over q49: within each near-dup cluster keep the
    // HIGHEST-quality document (q30's score), not the arbitrary minimum
    // id; dataset papers do exactly this so the surviving copy of a
    // near-dup family is its cleanest member. Deterministic argmax via
    // one integer key (floor-scaled quality ×1e10 − doc_id — total
    // order, so max_by/arg_max tie semantics never matter), clusters
    // from the same candidate artifact + CC as q49, and the output
    // carries both policies' keepers plus whether they differ — the
    // audit of what the refinement actually changes. Oracle: the q49
    // recursive-closure chain + the same integer argmax.
    QueryDef(
      "q190_quality_reps",
      """WITH RECURSIVE
        |cls AS (SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_exact, text
        |  FROM documents GROUP BY text),
        |r AS (SELECT doc_id, text FROM cls),
        |  """.stripMargin + lshPairsSql("r") + ",\n" +
        s"""j AS (SELECT p.a_id, p.b_id FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a_id
           |  JOIN sig sb ON sb.doc_id = p.b_id
           |  WHERE $estJaccardSql >= 0.5),
           |e AS (SELECT a_id AS src, b_id AS dst FROM j
           |  UNION SELECT b_id, a_id FROM j),
           |walk AS (
           |  SELECT doc_id AS node, doc_id AS lbl FROM cls
           |  UNION
           |  SELECT e.src AS node, walk.lbl FROM walk
           |  JOIN e ON e.dst = walk.node),
           |lab AS (SELECT node, MIN(lbl) AS cluster FROM walk
           |  GROUP BY node),
           |qv AS (SELECT cls.doc_id,
           |    CAST(floor(least(1.0,
           |        len(string_split(cls.text,' ')) / 100.0)
           |      * (1.0 - CAST(len(list_filter(string_split(cls.text,' '),
           |          w -> w IN ('the','a'))) AS DOUBLE)
           |        / len(string_split(cls.text,' '))) * 1000000)
           |      AS BIGINT) AS q6
           |  FROM cls)
           |SELECT lab.cluster,
           |  arg_max(lab.node, qv.q6 * 10000000000 - lab.node)
           |    AS keep_quality_id,
           |  MIN(lab.node) AS keep_min_id,
           |  arg_max(lab.node, qv.q6 * 10000000000 - lab.node)
           |    <> MIN(lab.node) AS changed,
           |  CAST(COUNT(*) AS BIGINT) AS n_members
           |FROM lab JOIN qv ON qv.doc_id = lab.node
           |GROUP BY lab.cluster ORDER BY cluster""".stripMargin) {
      (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val classes = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      val edges = lshCandidates(s, dir)
        .filter(col("est_jaccard") >= 0.5)
        .select("a_id", "b_id")
      val clusters = connectedComponents(edges, classes.select("doc_id"))
      val words = "split(text, ' ')"
      val qv = classes.select(col("doc_id"),
        expr(s"cast(floor(least(1.0, size($words) / 100.0) * (1.0 - " +
          s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
          s" / size($words)) * 1000000) as bigint)").as("q6"))
      clusters.toDF("node", "cluster")
        .join(qv.toDF("node", "q6"), "node")
        .groupBy("cluster")
        .agg(
          max_by(col("node"),
            col("q6") * 10000000000L - col("node"))
            .as("keep_quality_id"),
          min(col("node")).as("keep_min_id"),
          count(lit(1)).as("n_members"))
        .select(col("cluster"), col("keep_quality_id"),
          col("keep_min_id"),
          (col("keep_quality_id") =!= col("keep_min_id")).as("changed"),
          col("n_members"))
        .orderBy("cluster")
    },

    // Candidate-edge EXPLANATIONS — the dedup review queue's missing
    // column: for every LSH candidate pair, HOW MANY word-3-gram
    // shingles the two documents actually share and the
    // lexicographically-first shared shingle as the human-readable
    // witness ("these two match because of …"). The evidence join runs
    // only over the candidate pairs' own shingle sets (pairs-bounded —
    // the artifact makes explainability as cheap as the verdict);
    // distinct-shingle sets on both sides so within-doc repeats don't
    // inflate the count.
    QueryDef(
      "q195_edge_explanations",
      """WITH r AS (SELECT MIN(doc_id) AS doc_id, text FROM documents
        |  GROUP BY text),
        |  """.stripMargin + lshPairsSql("r") + ",\n" +
        """shl AS (SELECT DISTINCT doc_id, s FROM sg),
          |ev AS (SELECT p.a_id, p.b_id, CAST(count(*) AS BIGINT)
          |    AS n_shared, min(sa.s) AS witness
          |  FROM pairs p JOIN shl sa ON sa.doc_id = p.a_id
          |  JOIN shl sb ON sb.doc_id = p.b_id AND sb.s = sa.s
          |  GROUP BY p.a_id, p.b_id)
          |SELECT p.a_id, p.b_id,
          |  COALESCE(ev.n_shared, 0) AS n_shared, ev.witness
          |FROM pairs p LEFT JOIN ev USING (a_id, b_id)
          |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val pairs = lshCandidates(s, dir).select("a_id", "b_id")
      val reps = Tables(s, dir, "documents")
        .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      val shl = reps
        .select(col("doc_id"), expr("shingle_strings(text, 3)"))
        .select(col("doc_id"), col("sh").as("s")).distinct()
      val ev = pairs
        .join(shl.toDF("a_id", "s"), "a_id")
        .join(shl.toDF("b_id", "s"), Seq("b_id", "s"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("n_shared"), min(col("s")).as("witness"))
      pairs.join(ev, Seq("a_id", "b_id"), "left")
        .select(col("a_id"), col("b_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          col("witness"))
        .orderBy("a_id", "b_id")
    })

  /** Triangle counting on the near-dup candidate graph (q186) — the
    * clustering-coefficient primitive: how CLIQUE-LIKE is the duplicate
    * neighborhood (triangles = transitively-consistent near-dup
    * verdicts; a high open-wedge rate means the candidate generator's
    * edges don't agree with each other). The ordered-edge pattern makes
    * it scale-shaped: orient every edge low→high, join wedges
    * a<b<c on the middle vertex, then ONE semi-join of wedge closures
    * against the edge set — never an all-pairs expansion; wedge count
    * is Σ deg² over the (small) dup graph, the standard distributed
    * triangle bound.
    */
  private def triangleSql: String =
    """und AS (SELECT a_id AS lo, b_id AS hi FROM dup_edges),
      |w AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      |  FROM und e1 JOIN und e2 ON e2.lo = e1.hi),
      |tri AS (SELECT a, b, c FROM w
      |  WHERE EXISTS (SELECT 1 FROM und e3
      |    WHERE e3.lo = w.a AND e3.hi = w.c)),
      |nodes AS (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und),
      |deg AS (SELECT v, count(*) AS d FROM nodes GROUP BY v),
      |wedges AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_w
      |  FROM deg)
      |SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
      |  CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
      |  CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
      |  (SELECT n_w FROM wedges) AS n_wedges,
      |  CAST(CASE WHEN (SELECT n_w FROM wedges) = 0 THEN 0
      |    ELSE floor(3000000.0 * (SELECT count(*) FROM tri)
      |      / (SELECT n_w FROM wedges)) END AS BIGINT)
      |    AS global_clustering_ppm""".stripMargin

  /** The shared recursion text of q171 — appended after a `dup_edges`
    * CTE (oracle) or run against a `dup_edges` view (Spark). Both
    * engines execute THIS text verbatim.
    */
  private def reachRecursionSql: String =
    """und AS (SELECT a_id AS src, b_id AS dst FROM dup_edges
      |  UNION ALL SELECT b_id, a_id FROM dup_edges),
      |seed AS (SELECT src AS doc_id FROM (
      |    SELECT src, count(*) AS c FROM und GROUP BY src) t
      |  ORDER BY c DESC, src LIMIT 1),
      |reach(doc_id, depth) AS (
      |  SELECT doc_id, 0 FROM seed
      |  UNION ALL
      |  SELECT u.dst, r.depth + 1 FROM reach r
      |  JOIN und u ON u.src = r.doc_id WHERE r.depth < 6)
      |SELECT doc_id, CAST(min(depth) AS INTEGER) AS depth
      |FROM reach GROUP BY doc_id ORDER BY depth, doc_id""".stripMargin

  /** q125's cut-list as a materialized INDEX artifact
    * ([[graft.engine.Materialize]]): a span-dedup pass builds the
    * repeated-span table once per corpus version and every consumer —
    * the q125 listing, the q127 span-cutting rewrite — reads the
    * artifact instead of re-running the two gram passes.
    */
  def repeatedSpans(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "repeated_spans_10", dir) {
      graft.functions.VectorExpressions.register(s)
      val g = Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(text, 10)"))
      val rep = g.groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select("sh")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      g.join(rep, Seq("sh"), "left_semi")
        .select("doc_id", "pos")
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(min(col("pos")).as("start_pos"), max(col("pos")).as("end_pos"),
          count(lit(1)).as("n_grams"))
        .select(col("doc_id"), col("start_pos"), col("end_pos"),
          col("n_grams"),
          (col("end_pos") - col("start_pos") + 10).as("span_words"))
    }

  /** Merged spans of the corpus-FIRST occurrence (min doc_id, then min
    * pos) of each repeated 10-gram — the protection set of the q127
    * span-cutting rewrite: indices these spans cover hold the canonical
    * copy of a repeated region and must survive the cut. Materialized
    * beside [[repeatedSpans]] per corpus version. Scale shape: the
    * rank-over-gram window runs over repeated-gram OCCURRENCES only
    * (boilerplate-sized — the left-semi prunes the corpus first), and
    * the islands window partitions by doc.
    */
  def firstSpans(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "first_spans_10", dir) {
      graft.functions.VectorExpressions.register(s)
      val g = Tables(s, dir, "documents")
        .select(col("doc_id"), expr("shingle_strings(text, 10)"))
      val rep = g.groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2).select("sh")
      val wF = Window.partitionBy("sh").orderBy("doc_id", "pos")
      val first = g.join(rep, Seq("sh"), "left_semi")
        .withColumn("rn", row_number().over(wF))
        .filter(col("rn") === 1)
        .select("doc_id", "pos")
      val wI = Window.partitionBy("doc_id").orderBy("pos")
      first
        .withColumn("grp", col("pos") - row_number().over(wI))
        .groupBy("doc_id", "grp")
        .agg(min(col("pos")).as("start_pos"), max(col("pos")).as("end_pos"))
        .select("doc_id", "start_pos", "end_pos")
    }

  /** q127 build: the cleaned corpus after span-level dedup — every
    * repeated span cut except its corpus-wide first occurrence. Consumes
    * BOTH span artifacts: cut indices = ([[repeatedSpans]] expanded to
    * word indices) minus ([[firstSpans]] expanded); the rebuild is a
    * row-local indexed filter + array_join over each doc's word array.
    */
  def spanCutCorpus(s: SparkSession, dir: String): DataFrame = {
    val cov = repeatedSpans(s, dir)
      .select(col("doc_id"),
        explode(expr("sequence(start_pos, end_pos + 9)")).as("idx"))
    val prot = firstSpans(s, dir)
      .select(col("doc_id"),
        explode(expr("sequence(start_pos, end_pos + 9)")).as("idx"))
    val cuts = cov.join(prot, Seq("doc_id", "idx"), "left_anti")
      .distinct()
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("idx"))).as("cut"))
    Tables(s, dir, "documents")
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        expr("array_join(filter(split(text, ' '), " +
          "(w, i) -> cut IS NULL OR NOT array_contains(cut, i + 1)), ' ')")
          .as("clean_text"),
        coalesce(size(col("cut")), lit(0)).as("n_cut"))
  }

  /** q43 build: exact n-gram Jaccard over a capped id range — the ground
    * truth the LSH candidate path is audited against.
    *
    * @param cap id bound for the pair space (Some(30) = the q43/q48 oracle
    *            range); None = the whole corpus. Uncapped is NOT all-pairs:
    *            the pair space is generated by the shingle-hash equi-join,
    *            so only documents sharing at least one shingle ever meet —
    *            1.1M intermediate pairs at sf0.1, linear-ish in corpus
    *            size for natural text, which is what makes the full-corpus
    *            containment audit (q47) affordable.
    *
    * Built on the [[graft.functions.ShingleHashes]] generator, comparing
    * 64-bit shingle hashes instead of shingle strings: word triples map
    * 1:1 to the oracle's `concat_ws(' ', w1, w2, w3)` strings (words
    * cannot contain the separator), so distinct/intersection counts are
    * identical modulo xxhash64 collisions (~10^-9 at any realistic doc
    * size — and the oracle hash-compare would catch one). History: the
    * string formulation needed a `.cache()` to be viable — its distinct
    * shingle sets came from an interpreted `transform` lambda that
    * CollapseProject re-inlined into all four consumers (explode ×2 via
    * the self-join, size ×2), which without the cache recomputed the
    * lambda per reference: 308 s at sf0.1 for THIRTY documents. The
    * generator shape needs no cache (nothing pinned across queries in a
    * long-lived session) and no HOF: one row-local Generate feeding a
    * distinct whose Exchange is shared by every consumer via reuse.
    */
  def jaccardPairs(s: SparkSession, dir: String,
      cap: Option[Int] = Some(30)): DataFrame = {
    // The FULL-CORPUS exact pair-similarity table is itself a
    // materialized index artifact (the classic similarity-join
    // materialization): built once per corpus version from the shared
    // shingle artifact, then every consumer — q43's capped verifier,
    // q48's clustering edges, q47's uncapped truth side — is an artifact
    // read. A capped request filters BOTH pair sides: a pair with both
    // ids under the cap has the same shingle sets either way, so this is
    // exactly the capped-docs computation.
    val pairs = graft.engine.Materialize.table(s, "jaccard_pairs", dir) {
      val sh = distinctShingles(s, dir)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      sh.toDF("a_id", "ha").as("a")
        .join(sh.toDF("b_id", "hb").as("b"),
          col("ha") === col("hb") && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("inter"))
        .join(cnt.toDF("a_id", "na"), "a_id")
        .join(cnt.toDF("b_id", "nb"), "b_id")
        .select(col("a_id"), col("b_id"), col("inter"),
          (col("inter").cast("double") /
            (col("na") + col("nb") - col("inter"))).as("jaccard"))
    }
    cap.foldLeft(pairs)((p, c) =>
        p.filter(col("a_id") < c && col("b_id") < c))
      .orderBy("a_id", "b_id")
  }

  /** Connected components by iterative min-label propagation: every node's
    * label converges to the smallest doc_id reachable from it, so the
    * label IS the component's canonical representative.
    *
    * @param edges undirected edges, two numeric columns (any names)
    * @param nodes one numeric column — every node needing a label,
    *              including isolated ones (they keep their own id)
    * @return (node, label) — one row per input node
    *
    * Scale shape: each round is two hash-partitioned shuffles (neighbor
    * min + label update), and the round count is the graph DIAMETER —
    * near-dup clusters are dense blobs of the same underlying document,
    * so diameters stay in low single digits (an adversarial long-chain
    * graph would want the alternating large-star/small-star contraction
    * instead, which contracts in O(log n) rounds; not needed for dedup
    * workloads). `localCheckpoint` after each round truncates the plan —
    * without it the lineage doubles per iteration and analysis cost
    * explodes; checkpoint blocks of superseded iterations are released
    * by the ContextCleaner once unreferenced.
    *
    * Two sizing decisions make the loop cheap at any corpus size:
    *
    *  - The edge set is materialized ONCE up front (eager
    *    localCheckpoint): `edges` may carry an arbitrarily expensive
    *    upstream plan (in q49 it is the entire MinHash-LSH candidate
    *    pipeline), and without the checkpoint every iteration's join
    *    would recompute that plan from the scan up — measured 9-15 s for
    *    a loop whose per-round work is milliseconds.
    *  - The iteration runs ONLY over nodes that touch an edge. Isolated
    *    nodes (the overwhelming majority of a deduplicated corpus) can
    *    never change label, so they are attached once at the end via a
    *    left join with `coalesce(lbl, node)`. The iterated frames scale
    *    with the near-dup GRAPH, not the corpus — at 100 TB the graph
    *    side is small enough that AQE turns every per-round join into a
    *    broadcast.
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val Seq(ea, eb) = edges.columns.toSeq
    val sym = edges.select(col(ea).as("u"), col(eb).as("v"))
      .union(edges.select(col(eb).as("u"), col(ea).as("v")))
      .pinned
    var labels = sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).pinned
    var iter = 0
    var converged = false
    while (!converged) {
      iter += 1
      require(iter <= maxIter,
        s"connectedComponents did not converge in $maxIter rounds")
      val neighborMin = sym
        .join(labels, sym("u") === labels("node"))
        .groupBy(col("v").as("node"))
        .agg(min(col("lbl")).as("nlbl"))
      // `changed` rides along in the same checkpointed frame, so
      // convergence costs one filter over materialized rows, not a
      // join-per-round against the previous labels.
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("changed"))
        .pinned
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("node", "lbl")
    }
    nodes.toDF("node")
      .join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond") — the
    * O(log n)-round contraction [[connectedComponents]]' scaladoc
    * defers to for ADVERSARIAL graphs. Min-label propagation runs one
    * round per unit of graph DIAMETER: right for dedup blobs (diameter
    * ≤ single digits), catastrophic for a chain (n rounds). The star
    * alternation contracts any topology in O(log n) rounds:
    *
    *  - large-star: every node points its STRICTLY LARGER neighbors at
    *    its minimum neighborhood element (min(Γ(u) ∪ u)),
    *  - small-star: every node points its not-larger neighbors AND
    *    ITSELF at that minimum,
    *
    * iterated to edge-set fixpoint, at which the edges form stars rooted
    * at each component's minimum — labels read directly off the final
    * edges, no propagation phase. Per round: two self-grouped
    * aggregates + a distinct, all hash-partitioned by node — the same
    * shuffle bill per round as min-label, for exponentially fewer
    * rounds on long topologies. Convergence = (count, xxhash64-sum)
    * fixpoint of the canonical edge set: exact, order-free, and one
    * metadata-sized action per round. CcStarSpec pins label-identity
    * with min-label CC on real near-dup graphs and random graphs, and
    * logarithmic convergence on a path (400 nodes, ≤ 15 rounds where
    * min-label needs 399).
    */
  def connectedComponentsStar(edges: DataFrame, nodes: DataFrame,
      maxIter: Int = 40): DataFrame = {
    val Seq(ea, eb) = edges.columns.toSeq
    // canonical undirected form: (hi, lo), hi > lo, no self loops
    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("hi"),
        least(col("u"), col("v")).as("lo"))
      .distinct()
    var e = canon(edges.select(col(ea).as("u"), col(eb).as("v")))
      .pinned
    // DECIMAL sum: exact, order-free, and immune to the ANSI long
    // overflow a 64-bit-hash sum trips immediately.
    def fingerprint(d: DataFrame): (Long, java.math.BigDecimal) = {
      val r = d.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("hi"), col("lo"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var fp = fingerprint(e)
    var iter = 0
    var converged = false
    while (!converged) {
      iter += 1
      require(iter <= maxIter,
        s"connectedComponentsStar did not converge in $maxIter rounds")
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      // large-star: m(u) = min(Γ(u) ∪ u); edges (v, m) for v > u
      val mL = sym.union(sym.select(col("u"), col("u").as("v")))
        .groupBy("u").agg(min(col("v")).as("m"))
      val large = canon(sym.filter(col("v") > col("u"))
        .join(mL, "u").select(col("v").as("u"), col("m").as("v")))
      // small-star over edges directed large→small: m = min(Γ⁻(u) ∪ u);
      // edges (v, m) for v ∈ Γ⁻(u) ∪ {u}
      val mS = large.select(col("hi").as("u"), col("lo").as("v"))
        .groupBy("u").agg(min(col("v")).as("m"))
      val small = canon(
        large.select(col("hi").as("u"), col("lo").as("v"))
          .union(large.select(col("hi").as("u"), col("hi").as("v")))
          .join(mS, "u").select(col("v").as("u"), col("m").as("v")))
        .pinned
      val fpN = fingerprint(small)
      converged = fpN == fp
      fp = fpN
      e = small
    }
    // fixpoint edges are stars (hi → component-min lo)
    nodes.toDF("node")
      .join(e.select(col("hi").as("node"), col("lo").as("lbl")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
  }

  /** q44 build: exact-dedup representatives first, then MinHash-LSH
    * candidates over 16 perms × 4 bands.
    *
    * groupBy(text) not groupBy(sha(text))+first(text): a string-buffered
    * aggregate (first) forces SortAggregate; grouping directly on the
    * text keeps the dedup a HashAggregate with a fixed-width buffer.
    *
    * The candidate set is a session-materialized index artifact
    * ([[graft.engine.Materialize]]): a dedup system builds it once per
    * corpus and serves every consumer — the q44 listing, the q47
    * containment audit — from the artifact. Round 3 recomputed the whole
    * signature+banding pipeline inside each consumer (two extra corpus
    * scans per q47 run); now the corpus is scanned once per session.
    */
  /** Materialized distinct word-3-gram hash set (doc_id, h) for the WHOLE
    * corpus — the shared base of every exact-Jaccard consumer (q43's
    * capped verifier, q48's clustering edges, q47's uncapped truth side).
    * One corpus scan per corpus version; each consumer then reads a
    * columnar artifact with doc_id pushdown instead of re-shingling.
    */
  def distinctShingles(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "shingles3_distinct", dir) {
      shingleHashes(Tables(s, dir, "documents")).distinct()
    }

  /** Materialized doc → exact-dedup representative mapping (doc_id, rep):
    * rep = min doc_id sharing the same text. q47's audit joins this twice
    * (both pair sides); materialized, that is artifact reads, not two
    * more corpus scans + window sorts.
    */
  def docReps(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "doc_rep", dir) {
      Tables(s, dir, "documents").select(col("doc_id"),
        min(col("doc_id")).over(Window.partitionBy("text")).as("rep"))
    }

  /** The corpus-side BAND INDEX for incremental ingest (q133): one row
    * per (band, bucket key) per corpus exact-dedup representative,
    * carrying the rep's signature so a probe scores est_jaccard without
    * a second lookup. Built once per corpus version
    * ([[graft.engine.Materialize]]); a new batch deduplicates against
    * the corpus by probing this artifact — batch-sized work, zero
    * corpus scans. The corpus here is the non-delta slice
    * (doc_id % 10 <> 9, the q133 fixture boundary).
    */
  def corpusBandIndex(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "corpus_band_index", dir) {
      val reps = Tables(s, dir, "documents")
        .filter(col("doc_id") % 10 =!= 9)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      bandBuckets(minhashSigs(reps.select("doc_id", "text")),
          numPerms = 16, bands = 4)
        .select("doc_id", "sig", "band", "bh")
    }

  /** The LSH band index as a LIVE, incrementally-maintained table
    * (q135): a [[graft.engine.ManifestTableStore]] whose batch 0 holds
    * the corpus slice's exact-rep band rows and whose batch 1 appends
    * only the delta slice's NOVEL texts (anti-join against
    * already-indexed texts — first arrival wins). Appends are
    * idempotent per batch id, so re-invocation reads, never rewrites;
    * the store gives the index time travel and a change feed (an index
    * consumer can process only newly indexed rows via readChanges).
    */
  def maintainedBandIndex(s: SparkSession,
      dir: String): graft.engine.ManifestTableStore = {
    val store = new graft.engine.ManifestTableStore(
      graft.engine.Materialize.keyedPath(s, "band_index_store", dir))
    val docs = Tables(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
    val corpusReps = corpus.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    store.append(
      bandBuckets(minhashSigs(corpusReps.select("doc_id", "text")),
        numPerms = 16, bands = 4).select("doc_id", "sig", "band", "bh"),
      0L)
    val novelReps = docs.filter(col("doc_id") % 10 === 9)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .join(corpus.select("text"), Seq("text"), "left_anti")
    store.append(
      bandBuckets(minhashSigs(novelReps.select("doc_id", "text")),
        numPerms = 16, bands = 4).select("doc_id", "sig", "band", "bh"),
      1L)
    store
  }

  def lshCandidates(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "lsh_candidates_sha", dir) {
      val reps = Tables(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      minhashLshCandidates(minhashSigs(reps), numPerms = 16, bands = 4)
    }

  /** Keep-list of the composed training pipeline (q67): per surviving
    * document, its id, exact-dup multiplicity, and split assignment.
    *
    *  1. quality floor — q30's score (length saturation × non-stopword
    *     mass), row-local;
    *  2. exact dedup — one representative per byte-identical class;
    *  3. near-dup resolution — LSH candidates → signature-jaccard filter
    *     → connected components; the keeper is the min reachable doc_id
    *     (label == own id);
    *  4. content-addressed 80/10/10 split on the keeper's id — stable
    *     under corpus growth, any partitioning.
    */
  def trainingKeepList(docs: DataFrame, minQuality: Double): DataFrame = {
    val classes = qualityClasses(docs, minQuality)
    val edges = minhashLshCandidates(
        minhashSigs(classes.select("doc_id", "text")),
        numPerms = 16, bands = 4)
      .filter(col("est_jaccard") >= 0.5)
      .select("a_id", "b_id")
    keepListFrom(classes, edges)
  }

  /** Artifact-backed [[trainingKeepList]] — the registered q67 build.
    *
    * The quality floor is a pure function of `text`, so an exact-dup
    * class passes or fails it ATOMICALLY and every surviving class keeps
    * the same min-doc_id representative the unfiltered corpus gives it.
    * And LSH candidacy is pairwise-local (two signatures either share a
    * band bucket or don't, regardless of what else is in the corpus), so
    * the filtered pipeline's near-dup edges are EXACTLY the materialized
    * q44 candidate artifact restricted to surviving representatives —
    * two semi-joins against the kept-id set instead of a second
    * signature+banding pass over the corpus. At 100 TB that turns the
    * pipeline's most expensive stage into an index read.
    * PipelineInvariantsSpec asserts this build is row-identical to the
    * from-scratch [[trainingKeepList]].
    */
  def trainingKeepListIndexed(s: SparkSession, dir: String,
      minQuality: Double): DataFrame = {
    val classes = qualityClasses(Tables(s, dir, "documents"), minQuality)
    val ids = classes.select("doc_id")
    val edges = lshCandidates(s, dir)
      .filter(col("est_jaccard") >= 0.5)
      .join(ids.toDF("a_id"), Seq("a_id"), "left_semi")
      .join(ids.toDF("b_id"), Seq("b_id"), "left_semi")
      .select("a_id", "b_id")
    keepListFrom(classes, edges)
  }

  /** Stages 1+2 of the pipeline: quality floor (q30's score, row-local)
    * then exact-dup classes (rep = min doc_id, multiplicity carried).
    */
  private def qualityClasses(docs: DataFrame,
      minQuality: Double): DataFrame = {
    val words = "split(text, ' ')"
    val quality = expr(s"least(1.0, size($words) / 100.0) * (1.0 - " +
      s"cast(size(filter($words, w -> w in ('the','a'))) as double)" +
      s" / size($words))")
    docs.filter(quality >= minQuality)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_exact"))
  }

  /** Stages 3+4: near-dup resolution over the class graph, then the
    * content-addressed 80/10/10 split on each keeper's id.
    */
  private def keepListFrom(classes: DataFrame, edges: DataFrame): DataFrame = {
    val keepIds = connectedComponents(edges, classes.select("doc_id"))
      .toDF("doc_id", "cluster")
      .filter(col("doc_id") === col("cluster"))
      .select("doc_id")
    val split =
      "CASE WHEN substr(h, 1, 2) < 'cd' THEN 'train' " +
        "WHEN substr(h, 1, 2) < 'e6' THEN 'val' ELSE 'test' END"
    keepIds
      .join(classes.select("doc_id", "n_exact"), "doc_id")
      .withColumn("h",
        sha2(concat(lit("split-v1|"), col("doc_id").cast("string")), 256))
      .withColumn("split", expr(split))
      .select("doc_id", "n_exact", "split")
  }

  /** (doc_id, sig) via the row-local [[graft.functions.MinHashText]]
    * expression — the signature stage with ZERO shuffle: it evaluates
    * inside the scan's project, so nothing moves until LSH banding.
    * Bit-identical to shingle_strings → minhash_sig (MinHashTextSpec),
    * and sha-window oracle-portable (q44's DuckDB oracle recomputes the
    * same signatures in SQL); docs with fewer than n words surface as
    * null sigs and are dropped, matching the aggregate path's
    * no-shingle-rows contract.
    */
  def minhashSigs(docs: DataFrame, numPerms: Int = 16): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs.select(col("doc_id"),
        expr(s"minhash_text(text, 3, $numPerms)").as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Containment audit of the LSH scale path against exact ground truth:
    * every FULL-CORPUS exact-Jaccard pair >= minJaccard (computable
    * because the pair space is shingle-equi-join-bounded, see
    * [[jaccardPairs]]), with `covered` = the LSH pipeline would
    * deduplicate it. A truth pair is covered when (a) both docs collapse
    * to the same exact-dedup representative (jaccard 1.0 pairs never
    * reach LSH — byte-identical text is deduped exactly, which is the
    * pipeline's intent), or (b) the representatives' pair is in the q44
    * candidate set.
    *
    * Expected coverage follows the LSH s-curve for 16 perms × 4 bands of
    * 4 rows: P(candidate | j) = 1 - (1 - j^4)^4, whose 50 % point is
    * j = (1/4)^(1/4) ≈ 0.707. So 100 % containment is the right
    * assertion only well above that midpoint (DedupQualitySpec asserts
    * it at j >= 0.9 where the per-pair miss probability is ~1.4 %, and a
    * measured floor in the 0.7-0.9 band); every hash is seeded, so the
    * measured coverage is deterministic, not flaky.
    */
  def lshContainment(s: SparkSession, dir: String,
      minJaccard: Double): DataFrame = {
    val truth = jaccardPairs(s, dir, cap = None)
      .filter(col("jaccard") >= minJaccard)
    // doc -> exact-dedup representative, from the materialized artifact:
    // steady-state q47 touches ONLY artifacts (shingles, reps,
    // candidates) — zero corpus scans
    val repOf = docReps(s, dir)
    val cand = lshCandidates(s, dir)
      .select(col("a_id").as("c_a"), col("b_id").as("c_b"), lit(true).as("hit"))
    truth
      .join(repOf.select(col("doc_id").as("a_id"), col("rep").as("rep_a")),
        "a_id")
      .join(repOf.select(col("doc_id").as("b_id"), col("rep").as("rep_b")),
        "b_id")
      .withColumn("c_a", least(col("rep_a"), col("rep_b")))
      .withColumn("c_b", greatest(col("rep_a"), col("rep_b")))
      .join(cand, Seq("c_a", "c_b"), "left")
      .select(col("a_id"), col("b_id"), col("jaccard"),
        (col("rep_a") === col("rep_b") ||
          coalesce(col("hit"), lit(false))).as("covered"))
      .orderBy("a_id", "b_id")
  }

  /** One row per word-3-gram occurrence: (doc_id, h = xxhash64 of the three
    * words), via the custom [[graft.functions.ShingleHashes]] generator —
    * entirely row-local, so shingle hashes stream into the downstream
    * (map-side partial) MinHash aggregate with NO shuffle before the
    * per-doc groupBy. History: the HOF formulation (transform over a split
    * array) evaluated interpreted lambdas AND invited CollapseProject to
    * inline the tokenization into every downstream reference (measured
    * 4,300 CPU-seconds for 5k docs); the posexplode + window-lead shape
    * fixed that but paid a full-corpus Exchange + sort on doc_id for every
    * shingle occurrence — the largest data movement in the pipeline at
    * scale. The generator keeps the codegen'd aggregate and deletes the
    * shuffle.
    */
  def shingleHashes(docs: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("shingle_hashes(text, 3)"))
  }

  /** MinHash-LSH candidate pairs: input (doc_id, sig) signature rows
    * (e.g. from [[minhashSigs]]; any source whose sig arrays are
    * numPerms wide works — streaming selects included).
    *
    * History of the signature stage this consumes: HOF lambdas cost tens
    * of interpreted seconds; numPerms separate min-of-hash columns were
    * codegen'd but numPerms-wide; the MinHashAgg
    * TypedImperativeAggregate folded shingle rows map-side but still
    * shuffled one sig row per doc into the groupBy; the row-local
    * MinHashText expression deleted that exchange too (and round 6 made
    * the whole permutation family sha-window oracle-portable).
    * Pair generation does NOT self-join: docs are grouped per
    * (band, bucketHash) — LSH's guarantee is precisely that these groups
    * are small — and pairs expand locally inside each group, so the
    * quadratic work is bounded by the bucket size.
    */
  /** One row per (doc, band): bucket key = the band's sub-signature
    * ITSELF, rendered as a joined string. LSH banding only needs
    * EQUALITY of the band slice — hashing the slice (round 5 used
    * xxhash64) compressed the key but priced the whole pipeline out of
    * oracle reach; the literal key is exact (no bucket collisions at
    * all) and any SQL engine reproduces it. Row-local (posexplode of a
    * per-row transform) — works on batch and streaming frames alike.
    */
  def bandBuckets(sigs: DataFrame, numPerms: Int, bands: Int): DataFrame = {
    require(numPerms % bands == 0)
    val rows = numPerms / bands
    sigs
      .select(col("*"), posexplode(
        expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> array_join(transform(slice(sig, b * $rows + 1, $rows), " +
          "x -> cast(x as string)), ','))"))
        .as(Seq("band", "bh")))
  }

  def minhashLshCandidates(sigs: DataFrame, numPerms: Int, bands: Int): DataFrame = {
    graft.functions.VectorExpressions.register(sigs.sparkSession)
    // The sig subtree has THREE consumers (buckets + both pair joins).
    // Left bare, each would rescan the corpus and re-evaluate every
    // signature — at 100 TB that is three full text scans. The explicit
    // repartition inserts one Exchange of tiny (id, 128B sig) rows that
    // ReuseExchange dedups across all three consumers: one scan, one
    // signature pass, shuffle-file rereads for the rest. (A persist()
    // would pin a corpus-sized sig copy in executor memory per
    // invocation for the session's life — reused shuffle output is freed
    // with the job.)
    val sigsX = sigs.select("doc_id", "sig").repartition(col("doc_id"))
    val buckets = bandBuckets(sigsX, numPerms, bands)
    // members sorted by doc_id → i<j enumeration yields a_id < b_id.
    // Only PRIMITIVE doc_ids are collected (collect_list over structs with
    // nested arrays hits a pathologically slow aggregate path — measured
    // 10x+ on identical data); signatures join back per pair afterwards.
    // The sig subtree appears three times in this plan (buckets + the two
    // pair joins); with the row-local MinHashText signature that is three
    // shuffle-free re-evaluations fused into their consumers' scans — no
    // exchange, no persist() (a cache would pin a corpus-sized sig copy
    // per invocation for the life of the session; re-evaluating a tight
    // per-row loop is cheaper than rereading a cached block at scale).
    val pairIds = buckets
      .groupBy("band", "bh")
      .agg(array_sort(collect_list(col("doc_id"))).as("m"))
      .filter(size(col("m")) > 1)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(m) - 1), i -> " +
          "transform(sequence(i + 1, size(m)), j -> " +
          "struct(m[i-1] AS a_id, m[j-1] AS b_id))))")).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .distinct() // a pair may collide in several bands
    pairIds
      .join(sigsX.toDF("a_id", "sig_a"), "a_id")
      .join(sigsX.toDF("b_id", "sig_b"), "b_id")
      .withColumn("est_jaccard",
        expr("cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), " +
          "e -> e)) as double) / size(sig_a)"))
      .select("a_id", "b_id", "est_jaccard")
      .orderBy("a_id", "b_id")
  }
}
