package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryDef
import graft.engine.Tables

/** Deduplication operators for a training-data pipeline: exact hashing,
  * minhash signatures, LSH banding for near-dup candidate generation, and
  * n-gram Jaccard verification.
  *
  * Scale design (100 TB): exact dedup is one hash-partitioned groupBy on a
  * 32-byte key; minhash signatures are per-row HOFs (no shuffle); LSH
  * banding turns the O(n²) pair space into a groupBy on (band, bandHash)
  * buckets — pairs are only generated inside a bucket, which is the
  * standard MinHash-LSH bound on candidate count. The all-pairs Jaccard
  * (q43) is deliberately capped to a small id range: it is the *verifier*
  * for LSH candidates, not the scale path.
  */
object DedupOps {

  private val words = "split(text, ' ')"

  /** Word 3-gram shingles, 1-based slices; requires >= 3 words. */
  private val shingles =
    s"transform(sequence(1, size($words) - 2), i -> " +
      s"concat_ws(' ', element_at($words, i), element_at($words, i + 1), " +
      s"element_at($words, i + 2)))"

  /** doc_id + distinct shingle set for docs with >= 3 words. */
  private def shingleSets(s: SparkSession, dir: String, maxId: Long): DataFrame =
    Tables(s, dir, "documents")
      .filter(col("doc_id") < maxId && expr(s"size($words)") >= 3)
      .select(col("doc_id"), expr(s"array_distinct($shingles)").as("sh"))

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
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val d = shingleSets(s, dir, 30).cache()
      val sh = d.select(col("doc_id"), explode(col("sh")).as("sh"))
      val cnt = d.select(col("doc_id"), size(col("sh")).as("n"))
      val pairs = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(cnt.as("ca"), col("a_id") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("b_id") === col("cb.doc_id"))
        .select(col("a_id"), col("b_id"), col("inter"),
          (col("inter").cast("double") /
            (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // MinHash + LSH near-dup candidates — the scale path. 16 xxhash64
    // permutations over word 3-gram shingles, banded 4×4; pairs are
    // generated only within (band, bandHash) buckets, then scored by
    // signature agreement. Not ANSI-SQL-expressible (xxhash64) → rows-only.
    QueryDef.rowsOnly("q44_minhash_lsh_candidates") { (s, dir) =>
      minhashLshCandidates(shingleSets(s, dir, Long.MaxValue),
        numPerms = 16, bands = 4)
    })

  /** MinHash-LSH candidate pairs: input (doc_id, sh: array<string>). */
  def minhashLshCandidates(docs: DataFrame, numPerms: Int, bands: Int): DataFrame = {
    require(numPerms % bands == 0)
    val rows = numPerms / bands
    val sigCols = (0 until numPerms).map { p =>
      expr(s"array_min(transform(sh, x -> xxhash64($p, x)))").as(s"s$p")
    }
    val sigs = docs.select(col("doc_id") +: sigCols: _*)
    // One row per (doc, band): bucket key = hash of the band's row slice.
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => s"s${b * rows + r}").mkString(", ")
      struct(lit(b).as("band"), xxhash64(expr(s"array($slice)")).as("bh"))
    }
    val buckets = sigs
      .select(col("doc_id") +: (0 until numPerms).map(p => col(s"s$p")): _*)
      .withColumn("bk", explode(array(bandCols: _*)))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"),
        array((0 until numPerms).map(p => col(s"s$p")): _*).as("sig"))
    // Pairs only inside a bucket; distinct across bands.
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        expr("cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), " +
          "e -> e)) as double) / size(sig_a)"))
      .select("a_id", "b_id", "est_jaccard")
      .orderBy("a_id", "b_id")
  }
}
