package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.engine.Tables
import graft.engine.Pin.Pinnable

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Brute-force cosine top-k is the exactness baseline: the query set is
  * broadcast, so the candidate side streams with no shuffle and the only
  * exchange is the final per-query top-k (a tiny window over q×k rows
  * after local pre-ranking by AQE). The scale paths are IVF (q52: assign
  * to nearest centroid, then search only same-cell vectors) and
  * sign-random-hyperplane LSH (q53: 16-bit bucket join).
  *
  * All float math happens in double after an explicit element cast, as a
  * sequential left fold (`aggregate`), and crosses the oracle boundary
  * rounded to 6 decimals.
  */
object SimilarityOps {

  /** Embedding (raw float array — vec_dot handles the widening) + L2 norm,
    * shared by the queries below. vec_dot/vec_sqdist are custom codegen'd
    * expressions (graft.functions.VectorExpressions): a tight primitive
    * loop instead of interpreted HOF lambdas, same left-fold double
    * accumulation → bit-identical to the DuckDB oracle.
    */
  private def vectors(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    Tables(s, dir, "embeddings").select(
      col("vec_id"),
      col("embedding").as("v"),
      expr("sqrt(vec_dot(embedding, embedding))").as("nv"))
  }

  private val dot = "vec_dot(qv, v)"

  /** Materialized scalar-quantization INDEX artifact ([[graft.engine
    * .Materialize]]): ONE corpus pass computes the corpus-symmetric scale
    * and, per vector, the int8 codes (joined-string form for q71's
    * listing, int-array form for q74's scoring) plus the reconstruction
    * error. q71 lists the artifact and q74 scans its codes — neither
    * re-quantizes the corpus per query, which at 100 TB is the difference
    * between an index lookup and a full corpus pass per search.
    */
  private def quantIndex(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "quant_index", dir) {
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val scale = e.agg(
        max(expr("array_max(transform(v, x -> abs(x)))")).as("scale"))
      e.crossJoin(broadcast(scale)).select(
        col("vec_id"),
        expr("array_join(transform(v, " +
          "x -> cast(round(x / scale * 127) as tinyint)), ',')").as("code"),
        // codes as array<double> so the scoring pass runs in the
        // codegen'd vec_dot loop (int8 values and their 128-dim dot
        // products are exact in double — max |Σ| = 128·127² ≪ 2^53)
        expr("transform(v, x -> cast(cast(round(x / scale * 127) " +
          "as tinyint) as double))").as("codes"),
        expr("round(sqrt(aggregate(transform(v, " +
          "x -> pow(x - round(x / scale * 127) * scale / 127, 2)), " +
          "cast(0 as double), (a, b) -> a + b)), 6)").as("recon_err"))
    }

  /** Materialized hyperplane-LSH bucket table for the registered 16×4
    * operating point: (vec_id, t, bkt), one row per (vector, table).
    * Serves q53's candidate join and q54's audit from one build instead
    * of re-hashing the corpus per consumer. (`_sgn` = the round-6
    * oracle-portable ±1-sign plane family — a distinct artifact name so
    * a warehouse carrying the round-5 splitmix-plane buckets can never
    * serve them stale.)
    */
  private def hpBuckets(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "hp_buckets_sgnf16x4", dir) {
      vectors(s, dir)
        .select(col("vec_id"),
          posexplode(expr("vec_hp_buckets(v, 16, 4)")))
        .toDF("vec_id", "t", "bkt")
    }

  /** M=4 × 16-dim subvector split of every embedding (double-cast) — the
    * shared frame of the PQ build and query sides: (vec_id, m, sv).
    */
  private def pqSub(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    Tables(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("vec_id"), explode(expr("sequence(0, 3)")).as("m"),
        col("v"))
      .select(col("vec_id"), col("m"),
        expr("slice(v, m * 16 + 1, 16)").as("sv"))
  }

  /** Per-subspace PQ codebook: the vec_id < 8 subvectors (deterministic
    * "trained" codewords, mirroring q52's centroid convention) — 4×8
    * rows, always broadcast.
    */
  private def pqCodebook(sub: DataFrame): DataFrame =
    sub.filter(col("vec_id") < 8)
      .select(col("m"), col("vec_id").as("c_id"), col("sv").as("cv"))

  /** Materialized PQ code-table INDEX artifact: (vec_id, m, c_id) — every
    * vector encoded as its nearest codeword per subspace (argmin of the
    * 9-rounded subspace L2, ties to the lowest codeword id). This is the
    * structure a real engine builds once at index time: M small codes
    * replace the 4·D-byte vector payload for every ADC scoring pass.
    */
  private def pqIndex(s: SparkSession, dir: String): DataFrame =
    graft.engine.Materialize.table(s, "pq_index_4x8", dir) {
      val sub = pqSub(s, dir)
      val w = Window.partitionBy("vec_id", "m")
        .orderBy(col("dist"), col("c_id"))
      sub.join(broadcast(pqCodebook(sub)), "m")
        .select(col("vec_id"), col("m"), col("c_id"),
          expr("round(vec_sqdist(sv, cv), 9)").as("dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("vec_id", "m", "c_id")
    }

  val defs: Seq[QueryDef] = Seq(

    // Johnson–Lindenstrauss sparse random projection (Achlioptas ±1
    // signs): 64-d float embeddings → 32-d, the dimensionality-
    // reduction leg the similarity stack was missing. The projection
    // matrix is never materialized — the sign of cell (i, j) is pure
    // integer arithmetic over k = i*64+j (`(k²·2654435761 + k·40503)
    // mod 2^32 < 2^31`; QUADRATIC in k deliberately: a linear
    // multiplicative hash makes row i+1 a near-negation of row i —
    // arithmetic progressions mod 2^32 — which collapses the
    // projection's rank; the k² term decorrelates rows, measured
    // cosine-correlation 0.21 → 0.60), identical in any engine, so the
    // oracle reproduces the projection bit-for-bit; each element enters
    // as its ×10⁹ scaled long via floor(v·10⁹ + 0.5) — pure IEEE double
    // ops that are bit-identical across engines — and the fold is exact
    // BIGINT arithmetic. (Round 5 cast elements to DECIMAL(18,9), whose
    // half-way ties Spark rounds HALF_UP but DuckDB half-even: a
    // sf0.1-only 1-ulp mismatch the sf0.01 driver gate never saw —
    // caught by this round's full sf0.1 oracle sweep. floor(x+0.5) has
    // no tie ambiguity.) Row-local: fuses into the scan, zero
    // shuffle. At 100 TB the half-width candidate representation halves
    // scan bytes for the coarse pass; like q74/q110 the projection is a
    // candidate GENERATOR composed with exact re-rank, never a ranker —
    // DedupQualitySpec audits both the JL distance-preservation
    // property and projected-space recall against the q51 exact truth.
    QueryDef(
      "q121_random_projection",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id,
        |  list_transform(range(32), i ->
        |    CAST(list_sum(list_transform(range(64), j ->
        |      CAST(floor(v[j+1] * 1000000000 + 0.5) AS BIGINT) *
        |      (CASE WHEN ((i*64+j)*(i*64+j)*2654435761
        |                  + (i*64+j)*40503) % 4294967296 < 2147483648
        |            THEN 1 ELSE -1 END))) AS DOUBLE)
        |      / 1000000000) AS pr
        |  FROM e)
        |SELECT vec_id, """.stripMargin +
        (0 until 32).map(i => s"pr[${i + 1}] AS p$i").mkString(", ") +
        " FROM p ORDER BY vec_id") { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          "transform(sequence(0, 31), i -> " +
            "cast(aggregate(sequence(0, 63), 0L, " +
            "(a, j) -> a + " +
            "cast(floor(cast(element_at(embedding, j + 1) as double) " +
            "* 1000000000d + 0.5d) as bigint) * " +
            "(case when pmod((i * 64 + j) * (i * 64 + j) * 2654435761L " +
            "+ (i * 64 + j) * 40503L, 4294967296L) " +
            "< 2147483648L then 1L else -1L end)) " +
            "as double) / 1000000000d)").as("pr"))
        .select(col("vec_id") +: (0 until 32).map(i =>
          expr(s"element_at(pr, ${i + 1})").as(s"p$i")): _*)
        .orderBy("vec_id")
    },

    // Vector norms — array-HOF parity check.
    QueryDef(
      "q50_vector_norms",
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
        |    x -> x * x))), 6) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      Tables(s, dir, "embeddings").select(
        col("vec_id"),
        expr("size(embedding)").as("dim"),
        expr("round(sqrt(vec_dot(embedding, embedding)), 6)").as("l2"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-10 for a small query set (vec_id < 5).
    QueryDef(
      "q51_cosine_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nv
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, nv AS nq FROM e WHERE vec_id < 5),
        |sc AS (SELECT q_id, vec_id,
        |    round(list_dot_product(qv, v) / (nq * nv), 6) AS cos_r
        |  FROM q JOIN e ON e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos_r, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS INTEGER) AS rn
        |  FROM sc)
        |SELECT q_id, vec_id, cos_r, rn FROM r WHERE rn <= 10
        |ORDER BY q_id, rn""".stripMargin)(cosineTopK),

    // IVF building block: assign every vector to its nearest centroid
    // (deterministic "trained" centroids = vec_id < 8, broadcast).
    QueryDef(
      "q52_ivf_assign",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN c),
        |r AS (SELECT vec_id, c_id, dist_r, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d)
        |SELECT vec_id, c_id AS centroid_id, dist_r FROM r WHERE rn = 1
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val e = vectors(s, dir).select("vec_id", "v")
      val c = e.filter(col("vec_id") < 8).toDF("c_id", "cv")
      val w = Window.partitionBy("vec_id").orderBy(col("dist_r"), col("c_id"))
      e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id").as("centroid_id"), col("dist_r"))
        .orderBy("vec_id")
    },

    // Embedding-cosine near-duplicate pairs over a bounded id range —
    // the exactness oracle for near-dup detection (the LSH bucket path in
    // q53 is the scale variant of exactly this predicate).
    QueryDef(
      "q46_cosine_neardup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nv
        |  FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(a.v, b.v) / (a.nv * b.nv), 6) AS cos_r
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) / (a.nv * b.nv), 6) >= 0.3
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val e = vectors(s, dir).filter(col("vec_id") < 200)
      val a = e.toDF("a_id", "va", "na")
      val b = e.toDF("b_id", "vb", "nb")
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          expr("round(vec_dot(va, vb) / (na * nb), 6)").as("cos_r"))
        .filter(col("cos_r") >= 0.3)
        .orderBy("a_id", "b_id")
    },

    // Sign-random-hyperplane LSH ANN — the bucketed scale path. All
    // buckets come from ONE custom codegen'd expression
    // (HyperplaneBuckets): a tight loop with the deterministic splitmix64
    // weight matrix inlined. Multiple small tables, not one wide
    // signature: P[candidate] = 1 - (1 - p^bits)^tables.
    //
    // Operating point (16 tables × 4 bits) is CALIBRATED to this corpus,
    // measured by the recall sweep (AnnTuneDrive): the exact top-10 here
    // sits at cos 0.25-0.39 — near-orthogonal, the hardest regime for
    // hyperplane LSH (p_bit ≈ 0.6, candidate fraction ~ n^0.7) — so
    // buckets must stay coarse to hit recall@10 >= 0.8 (8×8 bits
    // measured 0.32). On a real near-dup corpus (cos >= 0.8,
    // p_bit >= 0.9) the same operator runs 16-24 bits per table with tiny
    // buckets and high recall — bits scale with log(n) and similarity,
    // which is why they are parameters, not constants. q54 audits THIS
    // registered config against the exact top-k. Fully hash-checked from
    // round 6: the ±1-sign plane family + floor-scaled integer dot
    // (vec_hp_buckets) is reproduced verbatim by the oracle below —
    // sign(k) is the q121 integer trick, the bit decision an exact
    // BIGINT sum, the re-rank the q51 cosine family.
    QueryDef(
      "q53_ann_lsh",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nv
        |  FROM embeddings),
        |r AS (SELECT vec_id, list_transform(range(64), d ->
        |    CAST(floor(v[d+1] * 1000000000 + 0.5) AS BIGINT))
        |    AS rv FROM e),
        |pl AS (SELECT t.t AS t, b.b AS b
        |  FROM (SELECT unnest(range(0,16)) AS t) t,
        |       (SELECT unnest(range(0,4)) AS b) b),
        |dots AS (SELECT vec_id, t, b,
        |    list_sum(list_transform(range(64), d ->
        |      (CASE WHEN (((t*4+b)*64+d)*((t*4+b)*64+d)*2246822519
        |          + ((t*4+b)*64+d)*3266489917) % 4294967296 < 2147483648
        |        THEN 1 ELSE -1 END) * rv[d+1])) AS s
        |  FROM r, pl),
        |bkt AS (SELECT vec_id, t,
        |    SUM(CASE WHEN s >= 0 THEN (1 << b) ELSE 0 END) AS bkt
        |  FROM dots GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
        |  FROM bkt q JOIN bkt c ON q.t = c.t AND q.bkt = c.bkt
        |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |sc AS (SELECT cand.q_id, cand.vec_id,
        |    round(list_dot_product(qe.v, ce.v) / (qe.nv * ce.nv), 6)
        |      AS cos_r
        |  FROM cand JOIN e qe ON qe.vec_id = cand.q_id
        |  JOIN e ce ON ce.vec_id = cand.vec_id),
        |rr AS (SELECT q_id, vec_id, cos_r, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS INTEGER)
        |    AS rn FROM sc)
        |SELECT q_id, vec_id, cos_r, rn FROM rr WHERE rn <= 10
        |ORDER BY q_id, rn""".stripMargin)((s, dir) =>
      annLshBucketed(vectors(s, dir), hpBuckets(s, dir),
        queryIds = 0 until 5, topK = 10)),

    // One Lloyd iteration of k-means — IVF "training" as a query: assign
    // every vector to its nearest centroid (exactly q52's logic), then
    // recompute each centroid as the per-dimension mean of its members.
    // Long output shape (centroid, dimension, mean) rather than
    // re-assembled arrays: the mean is decimal-accumulated (float sums
    // across shuffle partitions are order-nondeterministic in double;
    // decimal addition is exact and commutative), divided and rounded
    // once at the boundary. Iterating this query to a fixpoint IS k-means
    // training; each iteration is one broadcast crossjoin + one
    // hash-partitioned aggregate — no driver-side math.
    QueryDef(
      "q55_kmeans_step",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, c_id, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d),
        |m AS (SELECT vec_id, c_id FROM a WHERE rn = 1),
        |x0 AS (SELECT m.c_id, unnest(list_transform(range(1, len(e.v) + 1),
        |    i -> {'dim_i': i, 'x': e.v[i]})) AS u
        |  FROM m JOIN e ON e.vec_id = m.vec_id),
        |x AS (SELECT c_id, u.dim_i AS dim_i, u.x AS x FROM x0)
        |SELECT c_id, CAST(dim_i AS INTEGER) AS dim_i,
        |  round(CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE)
        |    / COUNT(*), 6) AS m
        |FROM x GROUP BY c_id, dim_i ORDER BY c_id, dim_i""".stripMargin) {
      (s, dir) =>
      val e = vectors(s, dir).select("vec_id", "v")
      val c = e.filter(col("vec_id") < 8).toDF("c_id", "cv")
      val w = Window.partitionBy("vec_id").orderBy(col("dist_r"), col("c_id"))
      val assigned = e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("v"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("c_id", "v")
      assigned
        .select(col("c_id"), posexplode(col("v")))
        .toDF("c_id", "p", "x")
        .groupBy(col("c_id"), (col("p") + 1).cast("int").as("dim_i"))
        .agg(round(sum(col("x").cast(DecimalType(38, 20))).cast("double") /
          count(lit(1)), 6).as("m"))
        .orderBy("c_id", "dim_i")
    },

    // ANN quality audit: recall@10 of the LSH path (q53) against the
    // exact top-k (q51), one row per query vector. The recall VALUE is
    // LSH-hash-dependent (not DuckDB-computable), so — q66's sketch
    // pattern — the plan asserts the per-query bound inside itself and
    // ships the verdict: measured per-query recall at the registered
    // 16×4 operating point is 0.6–0.9, asserted ≥ 0.5 with margin.
    // DedupQualitySpec still asserts the raw metric (mean ≥ 0.8); a hash
    // mismatch here means the index degraded below its floor.
    QueryDef(
      "q54_ann_recall",
      """SELECT vec_id AS q_id, CAST(10 AS BIGINT) AS n_exact,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY q_id""".stripMargin) {
      (s, dir) =>
      annRecall(s, dir)
        .select(col("q_id"), col("n_exact"),
          (col("recall") >= 0.5).as("recall_ok"))
        .orderBy("q_id")
    },

    // IVF probe SEARCH — the other standard ANN scale path (q52 is the
    // index build; this is the query side): per query, rank the 8
    // centroids, probe the nearest 4 cells, exact-cosine re-rank ONLY
    // vectors assigned to those cells. At scale the assignment is the
    // partition key of the stored index, so probing = partition pruning:
    // the scan touches nProbe/nCells of the corpus. Fully deterministic
    // (seeded centroids = vec_id < 8, rounded doubles) → oracle-verified,
    // unlike most ANN implementations.
    QueryDef(
      "q56_ivf_search",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nv
        |  FROM embeddings),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN c),
        |m AS (SELECT vec_id, c_id FROM (
        |    SELECT vec_id, c_id, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d) t
        |  WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, c_id FROM (
        |    SELECT vec_id, c_id, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d
        |    WHERE vec_id < 5) t
        |  WHERE rn <= 4),
        |cand AS (SELECT p.q_id, m.vec_id FROM probes p
        |  JOIN m ON m.c_id = p.c_id WHERE m.vec_id <> p.q_id),
        |q AS (SELECT vec_id AS q_id, v AS qv, nv AS nq FROM e
        |  WHERE vec_id < 5),
        |sc AS (SELECT cand.q_id, cand.vec_id,
        |    round(list_dot_product(qv, v) / (nq * nv), 6) AS cos_r
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id
        |  JOIN q ON q.q_id = cand.q_id),
        |r AS (SELECT q_id, vec_id, cos_r, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS INTEGER) AS rn
        |  FROM sc)
        |SELECT q_id, vec_id, cos_r, rn FROM r WHERE rn <= 10
        |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      ivfSearch(s, dir, nProbe = 4, topK = 10)
    },

    // IVF quality audit: recall@10 of the probe search (q56) against the
    // exact top-k (q51) — same acceptance metric as q54 gives the LSH
    // path, so the two ANN variants are comparable like-for-like. Same
    // assert-in-plan upgrade as q54: measured per-query recall is
    // 0.9–1.0 (4-of-8-cell probing), asserted ≥ 0.8 with margin;
    // DedupQualitySpec asserts the raw mean ≥ 0.9.
    QueryDef(
      "q57_ivf_recall",
      """SELECT vec_id AS q_id, CAST(10 AS BIGINT) AS n_exact,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5 ORDER BY q_id""".stripMargin) {
      (s, dir) =>
      ivfRecall(s, dir)
        .select(col("q_id"), col("n_exact"),
          (col("recall") >= 0.8).as("recall_ok"))
        .orderBy("q_id")
    },

    // Scalar quantization: int8 codes (corpus-symmetric scale) + per-
    // vector reconstruction error. The memory-bandwidth lever for ANN at
    // scale — codes are 4× smaller than float32, so a cell/bucket scan
    // moves a quarter of the bytes; recon_err is the quality the engine
    // trades for it. The scale factor is a 1-row broadcast (no driver
    // collect, no second pass over the corpus per vector).
    // The code column ships as a comma-joined string, not a top-level
    // array: the harness comparator sorts result columns with pandas,
    // which cannot hash/sort array cells (r3 red row) — and the joined
    // form is compared byte-exactly against DuckDB all the same.
    QueryDef(
      "q71_quantize",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT max(list_max(list_transform(v, x -> abs(x))))
        |  AS scale FROM e)
        |SELECT vec_id,
        |  array_to_string(list_transform(v,
        |    x -> CAST(round(x / scale * 127) AS TINYINT)), ',') AS code,
        |  round(sqrt(list_sum(list_transform(v,
        |    x -> pow(x - round(x / scale * 127) * scale / 127, 2)))), 6)
        |    AS recon_err
        |FROM e, s ORDER BY vec_id""".stripMargin) { (s, dir) =>
      quantIndex(s, dir).select("vec_id", "code", "recon_err")
        .orderBy("vec_id")
    },

    // Quantized ANN: candidate scan on q71's int8 codes (EXACT integer
    // dot products — ¼ the scan bytes of float32, deterministic across
    // engines), top-20 per query by quantized score, then exact cosine
    // re-rank to top-10. The candidate window's exchange moves
    // (q_id, vec_id, int score) — never a vector payload; float vectors
    // re-attach only for the ≤20-per-query re-rank (finding 10/13).
    QueryDef(
      "q74_quantized_search",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
        |      AS nv
        |  FROM embeddings),
        |s AS (SELECT max(list_max(list_transform(v, x -> abs(x))))
        |  AS scale FROM e),
        |c AS (SELECT vec_id,
        |    list_transform(v, x -> CAST(round(x / scale * 127) AS INTEGER))
        |      AS code
        |  FROM e, s),
        |q AS (SELECT vec_id AS q_id, code AS qc FROM c WHERE vec_id < 5),
        |sc AS (SELECT q.q_id, c.vec_id,
        |    CAST(list_dot_product(c.code, q.qc) AS BIGINT) AS qdot
        |  FROM c JOIN q ON c.vec_id <> q.q_id),
        |top AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY qdot DESC, vec_id) AS crn FROM sc) WHERE crn <= 20),
        |qv AS (SELECT vec_id AS q_id, v AS qvec, nv AS nq FROM e
        |  WHERE vec_id < 5),
        |r AS (SELECT t.q_id, t.vec_id,
        |    round(list_dot_product(qvec, v) / (nq * nv), 6) AS cos_r
        |  FROM top t JOIN e ON e.vec_id = t.vec_id
        |  JOIN qv ON qv.q_id = t.q_id)
        |SELECT q_id, vec_id, cos_r, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT q_id, vec_id, cos_r, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rn FROM r)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = vectors(s, dir)
      val coded = quantIndex(s, dir)
        .select(col("vec_id"), col("codes").as("code"))
      val qCodes = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("code").as("qc"))
      val scored = coded.crossJoin(broadcast(qCodes))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          expr("cast(vec_dot(code, qc) as bigint)").as("qdot"))
      val wCand = Window.partitionBy("q_id")
        .orderBy(col("qdot").desc, col("vec_id"))
      val top = scored.withColumn("crn", row_number().over(wCand))
        .filter(col("crn") <= 20).select("q_id", "vec_id")
      val queries = e.filter(col("vec_id") < 5).toDF("q_id", "qv", "nq")
      val wRank = Window.partitionBy("q_id")
        .orderBy(col("cos_r").desc, col("vec_id"))
      top.join(e, "vec_id").join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"),
          expr(s"round($dot / (nq * nv), 6)").as("cos_r"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 10)
        .orderBy("q_id", "rn")
    },

    // THE production ANN composition — IVF cell pruning × scalar
    // quantization × exact re-rank in one plan, the shape a 100 TB
    // vector index actually serves queries with: (1) probe the 4 nearest
    // of 8 cells (at scale: partition pruning — the scan touches
    // nProbe/nCells of the corpus); (2) score ONLY probed-cell members
    // with int8 codes from the materialized quantization index (¼ the
    // scan bytes, exchange carries (q_id, vec_id, int) — no payloads);
    // (3) exact-cosine re-rank of the quantized top-20 to final top-10
    // (float vectors re-attach for ≤20 rows/query). Every stage is
    // deterministic arithmetic — no LSH hashes — so unlike most ANN
    // implementations the COMPOSED result is fully oracle-checked.
    QueryDef(
      "q89_ivf_quantized_search",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
        |      AS nv
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN cent),
        |rk AS (SELECT vec_id, c_id, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d),
        |m AS (SELECT vec_id, c_id FROM rk WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, c_id FROM rk
        |  WHERE vec_id < 5 AND rn <= 4),
        |cand AS (SELECT p.q_id, m.vec_id FROM probes p
        |  JOIN m ON m.c_id = p.c_id WHERE m.vec_id <> p.q_id),
        |s AS (SELECT max(list_max(list_transform(v, x -> abs(x))))
        |  AS scale FROM e),
        |cds AS (SELECT vec_id, list_transform(v,
        |    x -> CAST(round(x / scale * 127) AS INTEGER)) AS code
        |  FROM e, s),
        |qc AS (SELECT vec_id AS q_id, code AS qcode FROM cds
        |  WHERE vec_id < 5),
        |sc AS (SELECT cand.q_id, cand.vec_id,
        |    CAST(list_dot_product(cds.code, qc.qcode) AS BIGINT) AS qdot
        |  FROM cand JOIN cds ON cds.vec_id = cand.vec_id
        |  JOIN qc ON qc.q_id = cand.q_id),
        |top AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY qdot DESC, vec_id) AS crn FROM sc) WHERE crn <= 20),
        |qv AS (SELECT vec_id AS q_id, v AS qvec, nv AS nq FROM e
        |  WHERE vec_id < 5),
        |r AS (SELECT t.q_id, t.vec_id,
        |    round(list_dot_product(qvec, v) / (nq * nv), 6) AS cos_r
        |  FROM top t JOIN e ON e.vec_id = t.vec_id
        |  JOIN qv ON qv.q_id = t.q_id)
        |SELECT q_id, vec_id, cos_r, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT q_id, vec_id, cos_r, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rn FROM r)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = vectors(s, dir)
      val c = e.select("vec_id", "v").filter(col("vec_id") < 8)
        .toDF("c_id", "cv")
      val wIvf = Window.partitionBy("vec_id").orderBy(col("dist_r"), col("c_id"))
      val ranked = e.select("vec_id", "v").crossJoin(broadcast(c))
        .select(col("vec_id"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
        .withColumn("rn", row_number().over(wIvf))
      val assign = ranked.filter(col("rn") === 1).select("vec_id", "c_id")
      val probes = ranked.filter(col("vec_id") < 5 && col("rn") <= 4)
        .select(col("vec_id").as("q_id"), col("c_id"))
      val cand = assign.join(broadcast(probes), "c_id")
        .filter(col("vec_id") =!= col("q_id"))
        .select("q_id", "vec_id")
      val coded = quantIndex(s, dir)
        .select(col("vec_id"), col("codes").as("code"))
      val qCodes = coded.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("code").as("qc"))
      val scored = cand.join(coded, "vec_id")
        .join(broadcast(qCodes), "q_id")
        .select(col("q_id"), col("vec_id"),
          expr("cast(vec_dot(code, qc) as bigint)").as("qdot"))
      val wCand = Window.partitionBy("q_id")
        .orderBy(col("qdot").desc, col("vec_id"))
      val top = scored.withColumn("crn", row_number().over(wCand))
        .filter(col("crn") <= 20).select("q_id", "vec_id")
      val queries = e.filter(col("vec_id") < 5).toDF("q_id", "qv", "nq")
      val wRank = Window.partitionBy("q_id")
        .orderBy(col("cos_r").desc, col("vec_id"))
      top.join(e, "vec_id").join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"),
          expr(s"round($dot / (nq * nv), 6)").as("cos_r"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 10)
        .orderBy("q_id", "rn")
    },

    // Semantic dedup (the SemDeDup pipeline): cluster embeddings via
    // broadcast-centroid assignment (q52's operator), then find
    // near-duplicate pairs ONLY within each cluster — the clustering is
    // what turns the corpus-quadratic pair space into K cluster-local
    // quadratics, which is the entire reason SemDeDup scales where
    // all-pairs cosine (q46's exactness baseline) cannot. A vector is
    // dropped when a same-cluster, lower-id vector sits at cosine ≥ 0.3
    // (keep-first representative selection, as in exact dedup q41).
    // Ships per-cluster corpus/drop counts; every stage is deterministic
    // arithmetic, so the composed pipeline is fully oracle-checked.
    QueryDef(
      "q101_semantic_dedup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      AS nv
        |  FROM embeddings),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN c),
        |asg AS (SELECT vec_id, c_id FROM (
        |    SELECT vec_id, c_id, ROW_NUMBER() OVER (
        |      PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d)
        |  WHERE rn = 1),
        |m AS (SELECT e.*, asg.c_id FROM e JOIN asg USING (vec_id)),
        |j AS (SELECT a.c_id, b.vec_id AS dropped
        |  FROM m a JOIN m b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) / (a.nv * b.nv), 6)
        |    >= 0.3),
        |nvec AS (SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
        |  FROM asg GROUP BY 1),
        |drops AS (SELECT c_id,
        |    CAST(COUNT(DISTINCT dropped) AS BIGINT) AS n_dropped
        |  FROM j GROUP BY 1)
        |SELECT nvec.c_id AS centroid_id, n_vectors,
        |  COALESCE(n_dropped, 0) AS n_dropped
        |FROM nvec LEFT JOIN drops USING (c_id) ORDER BY 1""".stripMargin) {
      (s, dir) =>
      val e = vectors(s, dir)
      val c = e.select("vec_id", "v").filter(col("vec_id") < 8)
        .toDF("c_id", "cv")
      val w = Window.partitionBy("vec_id").orderBy(col("dist_r"), col("c_id"))
      val asg = e.select("vec_id", "v").crossJoin(broadcast(c))
        .select(col("vec_id"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("vec_id", "c_id")
      // ONE cluster-partitioned assigned frame; the pair join's both
      // sides, and the per-cluster count, are renames ABOVE this
      // exchange, so ReuseExchange evaluates the assignment subtree
      // once (three evaluations otherwise — the corpus × centroids
      // pass is the expensive part at scale)
      val m = e.join(asg, "vec_id").repartition(col("c_id"))
      val a = m.select(col("c_id"), col("vec_id").as("a_id"),
        col("v").as("va"), col("nv").as("na"))
      val b = m.select(col("c_id"), col("vec_id").as("b_id"),
        col("v").as("vb"), col("nv").as("nb"))
      val pairs = a.join(b, Seq("c_id"))
        .filter(col("a_id") < col("b_id"))
        .filter(expr("round(vec_dot(va, vb) / (na * nb), 6)") >= 0.3)
        .select(col("c_id"), col("b_id").as("dropped"))
      val nvec = m.groupBy("c_id").agg(count(lit(1)).as("n_vectors"))
      val drops = pairs.groupBy("c_id")
        .agg(countDistinct("dropped").as("n_dropped"))
      nvec.join(drops, Seq("c_id"), "left")
        .select(col("c_id").as("centroid_id"), col("n_vectors"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
        .orderBy("centroid_id")
    },

    // Product-quantization ADC search — the third leg of the ANN index
    // trio next to scalar quantization (q71/q74/q89) and IVF cells
    // (q52/q56): the 64-dim space splits into M=4 subspaces, every
    // vector is pre-encoded as 4 codebook ids (the materialized
    // pq_index artifact), and a query builds a tiny 4×8 distance TABLE
    // to the codewords — the approximate distance of each corpus vector
    // is then a sum of table lookups on its codes (Asymmetric Distance
    // Computation, the Jégou/Douze/Schmid PQ scheme). The corpus-side
    // scan touches ONLY the code table (M ids per vector, no float
    // payload) joined to a broadcast distance table — at 100 TB that is
    // M bytes per vector instead of 4·D. Per-subspace distances round
    // at 9 decimals and accumulate in DECIMAL (order-free), so unlike
    // hash-based ANN the composed search is fully oracle-checked.
    QueryDef(
      "q106_pq_adc",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sub AS (SELECT vec_id, m, v[m*16+1:m*16+16] AS sv
        |  FROM e, (SELECT unnest([0,1,2,3]) AS m) ms),
        |cb AS (SELECT m, vec_id AS c_id, sv AS cv FROM sub
        |  WHERE vec_id < 8),
        |d AS (SELECT s.vec_id, s.m, c.c_id,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))), 9) AS dist
        |  FROM sub s JOIN cb c ON c.m = s.m),
        |enc AS (SELECT vec_id, m, c_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY dist, c_id) AS rn FROM d) WHERE rn = 1),
        |dt AS (SELECT vec_id AS q_id, m, c_id,
        |    CAST(dist AS DECIMAL(18,9)) AS qd
        |  FROM d WHERE vec_id < 5),
        |adc AS (SELECT dt.q_id, enc.vec_id,
        |    round(CAST(sum(qd) AS DOUBLE), 6) AS adc_r
        |  FROM enc JOIN dt ON dt.m = enc.m AND dt.c_id = enc.c_id
        |  WHERE enc.vec_id <> dt.q_id GROUP BY 1, 2),
        |r AS (SELECT q_id, vec_id, adc_r, CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY adc_r, vec_id) AS INTEGER) AS rn
        |  FROM adc)
        |SELECT q_id, vec_id, adc_r, rn FROM r WHERE rn <= 10
        |ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val sub = pqSub(s, dir)
      val dt = sub.filter(col("vec_id") < 5)
        .join(broadcast(pqCodebook(sub)), "m")
        .select(col("vec_id").as("q_id"), col("m"), col("c_id"),
          expr("cast(round(vec_sqdist(sv, cv), 9) as decimal(18,9))")
            .as("qd"))
      val w = Window.partitionBy("q_id").orderBy(col("adc_r"), col("vec_id"))
      pqIndex(s, dir)
        .join(broadcast(dt), Seq("m", "c_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(round(sum(col("qd")).cast("double"), 6).as("adc_r"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("q_id", "vec_id", "adc_r", "rn")
        .orderBy("q_id", "rn")
    },

    // IVF-PQ — the production composition of the two index halves (the
    // FAISS IVFPQ shape): IVF cell pruning (q52/q56) bounds the
    // candidate set to the probed cells, the PQ code-table artifact
    // (q106) scores those candidates by table lookups with no vector
    // payload, and the exact cosine re-rank touches full vectors only
    // for the ADC top-20. At 100 TB the scan cost is: centroid table
    // broadcast (tiny), ONE pre-built code table join pruned to probed
    // cells, float vectors fetched for ≤20 rows per query. Every stage
    // is deterministic (round-6/round-9 + decimal lookup-sums), so
    // unlike hash-based ANN the composed index is fully oracle-checked.
    QueryDef(
      "q110_ivfpq_search",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
        |      AS nv
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d0 AS (SELECT e.vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN cent),
        |rk AS (SELECT vec_id, c_id, ROW_NUMBER() OVER (
        |    PARTITION BY vec_id ORDER BY dist_r, c_id) AS rn FROM d0),
        |asg AS (SELECT vec_id, c_id FROM rk WHERE rn = 1),
        |probes AS (SELECT vec_id AS q_id, c_id FROM rk
        |  WHERE vec_id < 5 AND rn <= 4),
        |cand AS (SELECT p.q_id, asg.vec_id FROM probes p
        |  JOIN asg ON asg.c_id = p.c_id WHERE asg.vec_id <> p.q_id),
        |sub AS (SELECT vec_id, m, v[m*16+1:m*16+16] AS sv
        |  FROM e, (SELECT unnest([0,1,2,3]) AS m) ms),
        |cb AS (SELECT m, vec_id AS c_id, sv AS cv FROM sub
        |  WHERE vec_id < 8),
        |pd AS (SELECT s.vec_id, s.m, c.c_id,
        |    round(list_sum(list_transform(range(1, 17),
        |      i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))), 9) AS dist
        |  FROM sub s JOIN cb c ON c.m = s.m),
        |enc AS (SELECT vec_id, m, c_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY dist, c_id) AS rn FROM pd) WHERE rn = 1),
        |dt AS (SELECT vec_id AS q_id, m, c_id,
        |    CAST(dist AS DECIMAL(18,9)) AS qd
        |  FROM pd WHERE vec_id < 5),
        |adc AS (SELECT cand.q_id, cand.vec_id,
        |    round(CAST(sum(qd) AS DOUBLE), 6) AS adc_r
        |  FROM cand JOIN enc ON enc.vec_id = cand.vec_id
        |  JOIN dt ON dt.q_id = cand.q_id AND dt.m = enc.m
        |    AND dt.c_id = enc.c_id
        |  GROUP BY 1, 2),
        |top AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY adc_r, vec_id) AS crn FROM adc) WHERE crn <= 100),
        |qv AS (SELECT vec_id AS q_id, v AS qvec, nv AS nq FROM e
        |  WHERE vec_id < 5),
        |r AS (SELECT t.q_id, t.vec_id,
        |    round(list_dot_product(qvec, v) / (nq * nv), 6) AS cos_r
        |  FROM top t JOIN e ON e.vec_id = t.vec_id
        |  JOIN qv ON qv.q_id = t.q_id)
        |SELECT q_id, vec_id, cos_r, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT q_id, vec_id, cos_r, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS rn FROM r)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = vectors(s, dir)
      val c = e.select("vec_id", "v").filter(col("vec_id") < 8)
        .toDF("c_id", "cv")
      val wIvf = Window.partitionBy("vec_id")
        .orderBy(col("dist_r"), col("c_id"))
      val ranked = e.select("vec_id", "v").crossJoin(broadcast(c))
        .select(col("vec_id"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
        .withColumn("rn", row_number().over(wIvf))
      val assign = ranked.filter(col("rn") === 1).select("vec_id", "c_id")
      val probes = ranked.filter(col("vec_id") < 5 && col("rn") <= 4)
        .select(col("vec_id").as("q_id"), col("c_id"))
      val cand = assign.join(broadcast(probes), "c_id")
        .filter(col("vec_id") =!= col("q_id"))
        .select("q_id", "vec_id")
      val sub = pqSub(s, dir)
      val dt = sub.filter(col("vec_id") < 5)
        .join(broadcast(pqCodebook(sub)), "m")
        .select(col("vec_id").as("q_id"), col("m"), col("c_id"),
          expr("cast(round(vec_sqdist(sv, cv), 9) as decimal(18,9))")
            .as("qd"))
      val adc = cand.join(pqIndex(s, dir), "vec_id")
        .join(broadcast(dt), Seq("q_id", "m", "c_id"))
        .groupBy("q_id", "vec_id")
        .agg(round(sum(col("qd")).cast("double"), 6).as("adc_r"))
      val wCand = Window.partitionBy("q_id")
        .orderBy(col("adc_r"), col("vec_id"))
      val top = adc.withColumn("crn", row_number().over(wCand))
        .filter(col("crn") <= 100).select("q_id", "vec_id")
      val queries = e.filter(col("vec_id") < 5).toDF("q_id", "qv", "nq")
      val wRank = Window.partitionBy("q_id")
        .orderBy(col("cos_r").desc, col("vec_id"))
      top.join(e, "vec_id").join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"),
          expr(s"round($dot / (nq * nv), 6)").as("cos_r"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 10)
        .orderBy("q_id", "rn")
    },

    // Prototype (nearest-class-centroid) classifier — the embedding-
    // classifier filtering stage of CCNet/DoReMi-style curation
    // pipelines, evaluated as a confusion matrix over the labeled
    // corpus. Training is ONE decimal-accumulated per-(label, dim)
    // aggregate (the posexplode + DECIMAL(38,20) frame q55 established
    // — order-free, so the learned centroids are bit-identical across
    // engines); inference broadcasts the L reassembled centroid arrays
    // and scores every vector row-locally in the codegen'd vec_sqdist
    // loop. At 100 TB: no pair space at all — one corpus pass to train,
    // one to classify, the model is L×D doubles.
    QueryDef(
      "q111_prototype_classifier",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |x AS (SELECT label, u.dim_i AS dim_i, u.x AS x FROM (
        |    SELECT label, unnest(list_transform(range(1, len(v) + 1),
        |      i -> {'dim_i': i, 'x': v[i]})) AS u FROM e)),
        |cm AS (SELECT label, dim_i,
        |    round(CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE)
        |      / COUNT(*), 6) AS m
        |  FROM x GROUP BY label, dim_i),
        |cent AS (SELECT label AS p_label, list(m ORDER BY dim_i) AS cv
        |  FROM cm GROUP BY label),
        |d AS (SELECT e.vec_id, e.label, p_label,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN cent),
        |pred AS (SELECT vec_id, label, p_label FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dist_r, p_label) AS rn FROM d) WHERE rn = 1)
        |SELECT label, p_label, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY label, p_label""".stripMargin) {
      (s, dir) =>
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      classifyByPrototype(e, prototypeModel(s, dir))
        .groupBy("label", "p_label")
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "p_label")
    },

    // Hard-negative mining — the contrastive-training data op: for each
    // anchor, the top-5 nearest SAME-label vectors (the positives pool)
    // and the top-5 nearest DIFFERENT-label vectors (the hard negatives
    // a contrastive loss learns most from — near in embedding space,
    // wrong in label). One scored pass per anchor set (q51's broadcast
    // shape: anchors are broadcast-small by contract, the corpus side
    // streams row-local dot products), then two per-anchor windows over
    // the scored frame. At scale the exact pass swaps for the IVF/PQ
    // index probes (q56/q110) with this exact ranking contract.
    QueryDef(
      "q152_hard_negatives",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
        |      AS nv
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nv AS nq
        |  FROM e WHERE vec_id < 5),
        |sc AS (SELECT q_id, q_label, vec_id, label,
        |    round(list_dot_product(qv, v) / (nq * nv), 6) AS cos_r
        |  FROM q JOIN e ON e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos_r,
        |    CASE WHEN label = q_label THEN 'positive'
        |      ELSE 'hard_negative' END AS role,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY q_id, label = q_label
        |      ORDER BY cos_r DESC, vec_id) AS INTEGER) AS rn
        |  FROM sc)
        |SELECT q_id, role, rn, vec_id, cos_r FROM r WHERE rn <= 5
        |ORDER BY q_id, role, rn""".stripMargin) { (s, dir) =>
      val e = vectors(s, dir)
        .join(Tables(s, dir, "embeddings").select("vec_id", "label"),
          "vec_id")
      val q = e.select(col("vec_id").as("q_id"),
        col("label").as("q_label"), col("v").as("qv"),
        col("nv").as("nq")).filter(col("q_id") < 5)
      val w = Window.partitionBy(col("q_id"), col("same"))
        .orderBy(col("cos_r").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          expr(s"round($dot / (nq * nv), 6)").as("cos_r"),
          (col("label") === col("q_label")).as("same"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"),
          when(col("same"), lit("positive")).otherwise("hard_negative")
            .as("role"),
          col("rn").cast("int").as("rn"), col("vec_id"), col("cos_r"))
        .orderBy("q_id", "role", "rn")
    },

    // Label-noise audit (confident-learning-lite): assign every labeled
    // embedding to its nearest centroid (the q52 IVF assignment), take
    // each cluster's majority label, and flag the vectors whose own
    // label disagrees — the suspects a labeling-QA pass reviews first,
    // with the cluster's majority fraction as evidence strength.
    // Scale shape: the clustering bounds everything — the label
    // histogram is (clusters × labels)-sized, the majority frame is
    // broadcast back, and the only corpus-sized work is the one
    // assignment pass q52 already prices. No pairwise k-NN: nearest-
    // centroid is the scalable surrogate neighborhood at 100 TB.
    QueryDef(
      "q145_label_noise",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |c AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT vec_id, c_id,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY dist_r, c_id) AS rn FROM d) WHERE rn = 1),
        |lab AS (SELECT a.vec_id, a.c_id, emb.label
        |  FROM a JOIN embeddings emb USING (vec_id)),
        |counts AS (SELECT c_id, label, count(*) AS n FROM lab
        |  GROUP BY 1, 2),
        |maj AS (SELECT c_id, label AS maj_label, n,
        |    ROW_NUMBER() OVER (PARTITION BY c_id
        |      ORDER BY n DESC, label) AS rn,
        |    SUM(n) OVER (PARTITION BY c_id) AS tot FROM counts),
        |m AS (SELECT c_id, maj_label,
        |    round(n / CAST(tot AS DOUBLE), 6) AS maj_frac
        |  FROM maj WHERE rn = 1)
        |SELECT l.vec_id, l.label, l.c_id AS centroid_id,
        |  m.maj_label, m.maj_frac
        |FROM lab l JOIN m USING (c_id)
        |WHERE l.label <> m.maj_label ORDER BY l.vec_id""".stripMargin) {
      (s, dir) =>
      val e = vectors(s, dir).select("vec_id", "v")
      val c = e.filter(col("vec_id") < 8).toDF("c_id", "cv")
      val wA = Window.partitionBy("vec_id")
        .orderBy(col("dist_r"), col("c_id"))
      val assign = e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
        .withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
        .select("vec_id", "c_id")
      // The 3-column assignment frame is materialized ONCE (eager
      // localCheckpoint) because both consumers need it — the
      // per-cluster label histogram and the final suspect join; without
      // it each re-expands the corpus-sized nearest-centroid pass.
      val lab = assign.join(
        Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
        .pinned
      val counts = lab.groupBy("c_id", "label")
        .agg(count(lit(1)).as("n"))
      val wM = Window.partitionBy("c_id")
        .orderBy(col("n").desc, col("label"))
      val m = counts
        .withColumn("rn", row_number().over(wM))
        .withColumn("tot",
          sum(col("n")).over(Window.partitionBy("c_id")))
        .filter(col("rn") === 1)
        .select(col("c_id"), col("label").as("maj_label"),
          round(col("n") / col("tot").cast("double"), 6).as("maj_frac"))
      lab.join(broadcast(m), "c_id")
        .filter(col("label") =!= col("maj_label"))
        .select(col("vec_id"), col("label"),
          col("c_id").as("centroid_id"), col("maj_label"),
          col("maj_frac"))
        .orderBy("vec_id")
    },

    // Full Lloyd k-means TRAINING — the loop q55 is one step of, run to
    // T iterations with the trained centroids materialized as an index
    // artifact (the q139 BPE-trainer discipline applied to clustering:
    // iterate in Scala over DataFrames, localCheckpoint per step to keep
    // lineage flat, artifact serves every downstream consumer). Each
    // iteration is ONE broadcast crossjoin (centroids are k×d bounded
    // metadata — never shuffled) + one hash-partitioned decimal-exact
    // mean aggregate; the corpus is scanned once per iteration and
    // nothing corpus-sized ever reaches the driver. Cross-engine
    // determinism: distances and means are rounded to 6 decimals at
    // every iteration boundary, so both engines walk the SAME centroid
    // trajectory (an unrounded double mean would let a 1-ulp divergence
    // at iteration 1 reassign a knife-edge vector at iteration 2).
    // Oracle: the T iterations UNROLLED into chained CTEs — assignment,
    // long-form decimal mean, list re-assembly per stage — the same
    // construction the BPE learner's oracle uses, because argmax/
    // aggregation per round can't live in a recursive CTE.
    QueryDef("q155_kmeans_train", kmeansOracleSql(k = 8, iters = 3)) {
      (s, dir) => kmeansCentroids(s, dir, k = 8, iters = 3)
        .orderBy("c_id", "dim_i")
    },

    // PCA: top principal component of the embedding corpus by power
    // iteration — the whitening/variance-analysis primitive every
    // embedding pipeline wants before quantization or projection.
    // Scale split: the DATA-sized work is ONE distributed pass building
    // the d×d Gram/covariance matrix (vec_id-keyed self-join of the
    // centered long form; map-side combine collapses n·d² product rows
    // to d² partials before any exchange); the ITERATION then runs on
    // 4096 rows of bounded metadata at the driver — the trigram-model/
    // DSIR-weights precedent, not a corpus collect. Cross-engine
    // exactness: centered values floor-scale to 8-dp integers, so Gram
    // sums, matvecs, norms, and the Rayleigh quotient are INTEGER
    // arithmetic (BigInt here, HUGEINT in the oracle); the only float
    // ops — one divide, one sqrt per iteration, at fixed points — are
    // single correctly-rounded IEEE ops on identical inputs, then
    // floor-scaled. Oracle: the same 8 iterations unrolled as CTEs.
    QueryDef("q163_pca_power", pcaOracleSql(iters = 8)) { (s, dir) =>
      pcaTopComponent(s, dir, iters = 8).orderBy("dim_i")
    },

    // Top-2 PCA by DEFLATION — the effective-rank question q163 can't
    // answer alone: after the dominant component, how much variance is
    // left, and where? G₂ = G − λ₁v₁v₁ᵀ in the SAME ×1e6 integer space
    // (the rank-1 update floor-scales through one fixed-order double
    // product chain), then the identical power iteration runs on G₂.
    // Output per component: loadings, eigenvalue, and its share of
    // total variance (trace of G — an exact integer sum of the
    // diagonal). The corpus is touched exactly once (q163's Gram pass,
    // shared via the same collected matrix); both solves are bounded
    // driver metadata. Oracle: the gram prefix + TWO unrolled iteration
    // chains with the deflation CTE between them.
    QueryDef("q168_pca_top2", pcaTop2OracleSql(iters = 8)) { (s, dir) =>
      pcaComponents(s, dir, iters = 8).orderBy("component", "dim_i")
    },

    // Source-similarity MATRIX in embedding space — which sources are
    // redundant before the mix planner weighs them: per-source centroid
    // (decimal-exact per-dim means, the q55 discipline, floor-scaled to
    // ×1e6 integers) and the pairwise cosine of centroids over the
    // sources² pair space (190 pairs — metadata-sized, the whole point
    // of comparing CENTROIDS instead of documents). Dots and norms are
    // exact integer sums; one IEEE divide+sqrt pair at the boundary,
    // floor-scaled. The corpus is touched once for the centroid
    // aggregate.
    QueryDef(
      "q180_source_similarity",
      """WITH e AS (SELECT d.source, CAST(u.i AS INTEGER) AS i,
        |    em.embedding::DOUBLE[] AS v
        |  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id,
        |  LATERAL unnest(range(0, 64)) AS u(i)),
        |x AS (SELECT source, i, v[i + 1] AS xi FROM e),
        |c AS (SELECT source, i,
        |    CAST(floor(CAST(SUM(CAST(xi AS DECIMAL(38,20))) AS DOUBLE)
        |      / COUNT(*) * 1000000.0) AS BIGINT) AS m6
        |  FROM x GROUP BY source, i),
        |n AS (SELECT source, SUM(m6 * m6) AS nn FROM c GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |    SUM(a.m6 * b.m6) AS dot
        |  FROM c a JOIN c b ON b.i = a.i AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.source_a, p.source_b,
        |  floor(CAST(p.dot AS DOUBLE)
        |    / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
        |    * 1000000) / 1000000.0 AS cos_sim
        |FROM p JOIN n na ON na.source = p.source_a
        |JOIN n nb ON nb.source = p.source_b
        |ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      val x = Tables(s, dir, "embeddings")
        .join(Tables(s, dir, "documents").select("doc_id", "source"),
          col("doc_id") === col("vec_id"))
        .select(col("source"), posexplode(col("embedding")))
        .toDF("source", "i", "xf")
        .select(col("source"), col("i"), col("xf").cast("double").as("xi"))
      val c = x.groupBy("source", "i").agg(
        floor(sum(col("xi").cast(DecimalType(38, 20))).cast("double")
          / count(lit(1)) * 1000000.0).as("m6"))
      val n = c.groupBy("source")
        .agg(sum(col("m6") * col("m6")).as("nn"))
      val p = c.toDF("source_a", "i", "ma")
        .join(c.toDF("source_b", "i", "mb"), "i")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(sum(col("ma") * col("mb")).as("dot"))
      p.join(n.toDF("source_a", "na"), "source_a")
        .join(n.toDF("source_b", "nb"), "source_b")
        .select(col("source_a"), col("source_b"),
          (floor(col("dot").cast("double")
            / (sqrt(col("na").cast("double"))
              * sqrt(col("nb").cast("double"))) * 1000000)
            / 1000000.0).as("cos_sim"))
        .orderBy("source_a", "source_b")
    },

    // Clustering-quality audit: SIMPLIFIED SILHOUETTE per cluster over
    // the q155 trained centroids — a = distance to own centroid, b =
    // distance to the nearest other centroid, s = (b−a)/max(a,b),
    // averaged per cluster. The centroid-based form is exactly what
    // scales: O(n·k) broadcast distances instead of silhouette's O(n²)
    // pairwise definition, same plan as the assignment step the model
    // was trained with. Determinism: a and b are sqrt's of the SAME
    // rounded-6 squared distances the assignment ranks (sqrt is one
    // IEEE op; min/argmin happen on the rounded values), per-row s is
    // rounded to 9 and decimal-summed, the mean floor-scales at the
    // boundary. The oracle reuses the q155 unrolled-training chain so
    // both engines audit the SAME model.
    QueryDef(
      "q164_silhouette",
      kmeansChainSql(k = 8, iters = 3) +
        s""",
           |dd AS (SELECT e.vec_id, c.c_id,
           |    round(list_sum(list_transform(range(1, len(e.v) + 1),
           |      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)
           |      AS dist_r
           |  FROM e CROSS JOIN c3 c),
           |asg AS (SELECT vec_id, c_id, sqrt(dist_r) AS a
           |  FROM (SELECT vec_id, c_id, dist_r,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id
           |        ORDER BY dist_r, c_id) AS rn FROM dd) t WHERE rn = 1),
           |bb AS (SELECT dd.vec_id, sqrt(min(dd.dist_r)) AS b
           |  FROM dd JOIN asg ON asg.vec_id = dd.vec_id
           |  WHERE dd.c_id <> asg.c_id GROUP BY dd.vec_id),
           |sil AS (SELECT asg.c_id,
           |    CASE WHEN greatest(asg.a, bb.b) = 0 THEN 0.0
           |         ELSE (bb.b - asg.a) / greatest(asg.a, bb.b) END AS s
           |  FROM asg JOIN bb ON bb.vec_id = asg.vec_id)
           |SELECT c_id, CAST(count(*) AS BIGINT) AS n_vecs,
           |  floor(CAST(SUM(CAST(round(s, 9) AS DECIMAL(28,9)))
           |      AS DOUBLE) / count(*) * 1000000) / 1000000.0
           |    AS mean_silhouette
           |FROM sil GROUP BY c_id ORDER BY c_id""".stripMargin) {
      (s, dir) =>
      val cv = kmeansCentroids(s, dir, k = 8, iters = 3)
        .groupBy("c_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim_i"), col("m")))),
          t => t.getField("m")).as("cv"))
      val d = vectors(s, dir).select("vec_id", "v")
        .crossJoin(broadcast(cv))
        .select(col("vec_id"), col("c_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
      val wA = Window.partitionBy("vec_id")
        .orderBy(col("dist_r"), col("c_id"))
      val a = d.withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id"), sqrt(col("dist_r")).as("a"))
      val b = d
        .join(a.select(col("vec_id"), col("c_id").as("ac")), "vec_id")
        .filter(col("c_id") =!= col("ac"))
        .groupBy("vec_id").agg(sqrt(min(col("dist_r"))).as("b"))
      a.join(b, "vec_id")
        .select(col("c_id"),
          when(greatest(col("a"), col("b")) === 0, lit(0.0))
            .otherwise((col("b") - col("a"))
              / greatest(col("a"), col("b"))).as("s"))
        .groupBy("c_id")
        .agg(count(lit(1)).as("n_vecs"),
          (floor(sum(round(col("s"), 9).cast(DecimalType(28, 9)))
            .cast("double") / count(lit(1)) * 1000000) / 1000000.0)
            .as("mean_silhouette"))
        .orderBy("c_id")
    },

    // Embedding OUTLIER audit — the corpus-QA pass before training on
    // labeled embeddings: per label, the vectors farthest from their
    // own label centroid, with a variance-normalized z-score as
    // evidence. Complements q145 (which flags label DISAGREEMENT via
    // cluster majorities; this flags WITHIN-label eccentricity —
    // mislabeled, corrupted, or out-of-distribution vectors that still
    // sit in a majority-consistent cluster). Scale shape: centroids are
    // the q111 decimal-exact per-(label, dim) means (L×D bounded
    // metadata, broadcast back); distances are one row-local codegen'd
    // vec_sqdist pass; the z statistics are a labels-sized aggregate.
    // Determinism: rounded-6 distances, decimal-accumulated moments,
    // variance guarded non-negative, z floor-scaled — the q164 recipe.
    QueryDef(
      "q201_embedding_outliers",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |x AS (SELECT label, u.dim_i AS dim_i, u.x AS x FROM (
        |    SELECT label, unnest(list_transform(range(1, len(v) + 1),
        |      i -> {'dim_i': i, 'x': v[i]})) AS u FROM e)),
        |cm AS (SELECT label, dim_i,
        |    round(CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE)
        |      / COUNT(*), 6) AS m
        |  FROM x GROUP BY label, dim_i),
        |cent AS (SELECT label, list(m ORDER BY dim_i) AS cv
        |  FROM cm GROUP BY label),
        |d AS (SELECT e.vec_id, e.label,
        |    round(list_sum(list_transform(range(1, len(v) + 1),
        |      i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS dist_r
        |  FROM e JOIN cent USING (label)),
        |st AS (SELECT label,
        |    round(CAST(SUM(CAST(dist_r AS DECIMAL(18,6))) AS DOUBLE)
        |      / COUNT(*), 6) AS mean_d,
        |    round(CAST(SUM(CAST(round(dist_r * dist_r, 6)
        |        AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS m2
        |  FROM d GROUP BY label),
        |z AS (SELECT d.label, d.vec_id, d.dist_r,
        |    CASE WHEN st.m2 - st.mean_d * st.mean_d <= 0 THEN 0.0
        |      ELSE floor((d.dist_r - st.mean_d)
        |        / sqrt(st.m2 - st.mean_d * st.mean_d) * 1000000)
        |        / 1000000.0 END AS z,
        |    ROW_NUMBER() OVER (PARTITION BY d.label
        |      ORDER BY d.dist_r DESC, d.vec_id) AS rn
        |  FROM d JOIN st USING (label))
        |SELECT label, CAST(rn AS INTEGER) AS rn, vec_id, dist_r, z
        |FROM z WHERE rn <= 3 ORDER BY label, rn""".stripMargin) {
      (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      val cent = e
        .select(col("label"), posexplode(col("v")))
        .toDF("label", "p", "x")
        .groupBy(col("label"), (col("p") + 1).cast("int").as("dim_i"))
        .agg(round(sum(col("x").cast(DecimalType(38, 20))).cast("double")
          / count(lit(1)), 6).as("m"))
        .groupBy("label")
        .agg(transform(
          array_sort(collect_list(struct(col("dim_i"), col("m")))),
          t => t.getField("m")).as("cv"))
      val d = e.join(broadcast(cent), "label")
        .select(col("label"), col("vec_id"),
          expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
      val st = d.groupBy("label").agg(
        round(sum(col("dist_r").cast(DecimalType(18, 6))).cast("double")
          / count(lit(1)), 6).as("mean_d"),
        round(sum(round(col("dist_r") * col("dist_r"), 6)
            .cast(DecimalType(28, 6))).cast("double")
          / count(lit(1)), 6).as("m2"))
      val varC = col("m2") - col("mean_d") * col("mean_d")
      d.join(broadcast(st), "label")
        .withColumn("z", when(varC <= 0, lit(0.0))
          .otherwise(floor((col("dist_r") - col("mean_d"))
            / sqrt(varC) * 1000000) / 1000000.0))
        .withColumn("rn", row_number().over(Window.partitionBy("label")
          .orderBy(col("dist_r").desc, col("vec_id"))))
        .filter(col("rn") <= 3)
        .select(col("label"), col("rn").cast("int").as("rn"),
          col("vec_id"), col("dist_r"), col("z"))
        .orderBy("label", "rn")
    }
  )

  /** Unrolled power-iteration oracle for [[pcaTopComponent]]: integer
    * Gram g6 (covariance ×1e6), v0 = 0.125×1e9 per dim, then per
    * iteration a HUGEINT matvec, one sqrt-norm, one floor-scale back to
    * ×1e9 integers; Rayleigh quotient from the final vector.
    */
  private def pcaOracleSql(iters: Int): String =
    pcaGramSql + pcaIterSql("g", "v", iters) +
      s"""
         |SELECT v.i AS dim_i, CAST(v.v9 AS DOUBLE) / 1000000000.0
         |    AS loading,
         |  floor(CAST(s3v.s3 AS DOUBLE) / CAST(s2v.s2 AS DOUBLE))
         |    / 1000000.0 AS eig
         |FROM v$iters v, s3v, s2v ORDER BY dim_i""".stripMargin

  /** WITH-prefix ending in the integer Gram CTE `g(i, j, g6)`.
    * (`def`, not `val`: the defs list consumes it during object init,
    * before a later-declared val would be assigned.)
    */
  private def pcaGramSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings),
      |nn AS (SELECT count(*) AS n FROM e),
      |x AS (SELECT vec_id, CAST(u.i AS INTEGER) AS i, v[u.i + 1] AS xi
      |  FROM e, LATERAL unnest(range(0, 64)) AS u(i)),
      |m AS (SELECT i, floor(CAST(SUM(CAST(xi AS DECIMAL(38,20)))
      |      AS DOUBLE) / (SELECT n FROM nn) * 1000000000.0)
      |    / 1000000000.0 AS m
      |  FROM x GROUP BY i),
      |cx AS (SELECT vec_id, x.i,
      |    CAST(floor((xi - m.m) * 100000000.0) AS BIGINT) AS c
      |  FROM x JOIN m ON m.i = x.i),
      |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
      |    CAST(floor(CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS DOUBLE)
      |      / ((SELECT n FROM nn) * 1e16) * 1000000.0) AS BIGINT) AS g6
      |  FROM cx a JOIN cx b ON b.vec_id = a.vec_id GROUP BY a.i, b.i)"""
      .stripMargin

  /** The unrolled power-iteration chain over Gram CTE `gName`, naming
    * its vectors `$p0..$p$iters` and ending with Rayleigh CTEs
    * `s3$p` / `s2$p`. Appendable after [[pcaGramSql]] (or a deflated
    * Gram) any number of times with distinct prefixes.
    */
  private def pcaIterSql(gName: String, p: String, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s""",
         |${p}0 AS (SELECT CAST(t.i AS INTEGER) AS i,
         |    CAST(125000000 AS BIGINT) AS v9
         |  FROM range(0, 64) t(i))""".stripMargin)
    for (t <- 1 to iters) {
      sb.append(
        s""",
           |w$p$t AS MATERIALIZED (SELECT g.i,
           |    SUM(CAST(g.g6 AS HUGEINT) * v.v9) AS w
           |  FROM $gName g JOIN $p${t - 1} v ON v.i = g.j GROUP BY g.i),
           |n$p$t AS (SELECT sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nrm
           |  FROM w$p$t),
           |$p$t AS MATERIALIZED (SELECT i, CAST(floor(CAST(w AS DOUBLE)
           |    / (SELECT nrm FROM n$p$t) * 1000000000.0) AS BIGINT) AS v9
           |  FROM w$p$t)""".stripMargin)
    }
    sb.append(
      s""",
         |s3$p AS (SELECT SUM(CAST(g.g6 AS HUGEINT) * a.v9 * b.v9) AS s3
         |  FROM $gName g JOIN $p$iters a ON a.i = g.i
         |  JOIN $p$iters b ON b.i = g.j),
         |s2$p AS (SELECT SUM(CAST(v9 AS HUGEINT) * v9) AS s2
         |  FROM $p$iters)""".stripMargin)
    sb.toString
  }

  /** Top principal component `(dim_i, loading, eig)` as a Materialize
    * artifact (trained once per corpus version; consumers read the
    * component, not the corpus). The corpus-sized pass is the Gram
    * build; the 64×64 solve is driver-side bounded metadata.
    */
  private[ops] def pcaTopComponent(s: SparkSession, dir: String,
      iters: Int): DataFrame =
    graft.engine.Materialize.table(s, s"pca_top_component_$iters", dir) {
      val gm = pcaGram6(s, dir)
      val (v, l6) = pcaPowerIter(gm, iters)
      import s.implicits._
      v.zipWithIndex
        .map { case (v9, i) => (i, v9.doubleValue / 1e9, l6 / 1e6) }
        .toSeq.toDF("dim_i", "loading", "eig")
    }

  /** Oracle for [[pcaComponents]]: gram → iterate (prefix v) → λ₁ →
    * deflate → iterate (prefix u) → λ₂ → trace → both components.
    */
  private def pcaTop2OracleSql(iters: Int): String =
    pcaGramSql + pcaIterSql("g", "v", iters) +
      s""",
         |l1 AS (SELECT CAST(floor(CAST(s3.s3 AS DOUBLE)
         |    / CAST(s2.s2 AS DOUBLE)) AS BIGINT) AS l6
         |  FROM s3v s3, s2v s2),
         |g2 AS MATERIALIZED (SELECT g.i, g.j,
         |    g.g6 - CAST(floor(CAST(l1.l6 AS DOUBLE) * a.v9 * b.v9
         |      / 1e18) AS BIGINT) AS g6
         |  FROM g JOIN v$iters a ON a.i = g.i
         |  JOIN v$iters b ON b.i = g.j, l1)""".stripMargin +
      pcaIterSql("g2", "u", iters) +
      s""",
         |l2 AS (SELECT CAST(floor(CAST(s3.s3 AS DOUBLE)
         |    / CAST(s2.s2 AS DOUBLE)) AS BIGINT) AS l6
         |  FROM s3u s3, s2u s2),
         |tr AS (SELECT CAST(SUM(g6) AS BIGINT) AS t6 FROM g
         |  WHERE i = j)
         |SELECT * FROM (
         |  SELECT 1 AS component, v.i AS dim_i,
         |    CAST(v.v9 AS DOUBLE) / 1000000000.0 AS loading,
         |    CAST(l1.l6 AS DOUBLE) / 1000000.0 AS eig,
         |    floor(CAST(l1.l6 AS DOUBLE) / CAST(tr.t6 AS DOUBLE)
         |      * 1000000) / 1000000.0 AS var_frac
         |  FROM v$iters v, l1, tr
         |  UNION ALL
         |  SELECT 2, u.i, CAST(u.v9 AS DOUBLE) / 1000000000.0,
         |    CAST(l2.l6 AS DOUBLE) / 1000000.0,
         |    floor(CAST(l2.l6 AS DOUBLE) / CAST(tr.t6 AS DOUBLE)
         |      * 1000000) / 1000000.0
         |  FROM u$iters u, l2, tr
         |) z ORDER BY component, dim_i""".stripMargin

  /** Top-2 components `(component, dim_i, loading, eig, var_frac)` as a
    * Materialize artifact; ONE corpus pass (the shared Gram), two
    * bounded driver solves with an integer rank-1 deflation between.
    */
  private[ops] def pcaComponents(s: SparkSession, dir: String,
      iters: Int): DataFrame =
    graft.engine.Materialize.table(s, s"pca_components_2x$iters", dir) {
      val d = 64
      val g1 = pcaGram6(s, dir)
      val (v1, l1) = pcaPowerIter(g1, iters)
      val tr = (0 until d).map(i => g1.getOrElse((i, i), 0L)).sum
      val g2 = (for (i <- 0 until d; j <- 0 until d) yield
        (i, j) -> (g1.getOrElse((i, j), 0L) -
          math.floor(l1.toDouble * v1(i).doubleValue * v1(j).doubleValue
            / 1e18).toLong)).toMap
      val (v2, l2) = pcaPowerIter(g2, iters)
      def frac(l: Long): Double =
        math.floor(l.toDouble / tr.toDouble * 1000000) / 1000000.0
      import s.implicits._
      (v1.zipWithIndex.map { case (x, i) =>
        (1, i, x.doubleValue / 1e9, l1 / 1e6, frac(l1))
      } ++ v2.zipWithIndex.map { case (x, i) =>
        (2, i, x.doubleValue / 1e9, l2 / 1e6, frac(l2))
      }).toSeq.toDF("component", "dim_i", "loading", "eig", "var_frac")
    }

  /** One distributed pass to the 64×64 integer Gram (covariance ×1e6):
    * centered long form floor-scaled to 8-dp integers, vec_id-keyed
    * self-join with map-side combine, collected as bounded metadata.
    *
    * Operating bound: a single centered product |c·c2| must fit int64
    * before the decimal cast, i.e. |x − mean| < ~9.6 per coordinate at
    * the 1e8 scale (embeddings here are unit-ish, |x| ≤ 0.6). Data with
    * larger coordinates needs the scale dropped to 1e6 (bound ~960) —
    * the sums themselves are exact at any scale via DECIMAL/HUGEINT.
    */
  private def pcaGram6(s: SparkSession,
      dir: String): Map[(Int, Int), Long] = {
    val x = vectors(s, dir)
      .select(col("vec_id"), posexplode(col("v")))
      .toDF("vec_id", "i", "xf")
      .select(col("vec_id"), col("i"), col("xf").cast("double").as("xi"))
    val n = Tables(s, dir, "embeddings").count()
    val m = x.groupBy("i").agg(
      (floor(sum(col("xi").cast(DecimalType(38, 20))).cast("double")
        / n * 1e9) / 1e9).as("m"))
    val cx = x.join(broadcast(m), "i")
      .select(col("vec_id"), col("i"),
        floor((col("xi") - col("m")) * 1e8).as("c"))
    cx.join(cx.toDF("vec_id", "j", "c2"), "vec_id")
      .groupBy("i", "j")
      .agg(sum((col("c") * col("c2")).cast(DecimalType(38, 0))).as("sp"))
      .select(col("i"), col("j"),
        floor(col("sp").cast("double") / (n.toDouble * 1e16) * 1e6)
          .as("g6"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
  }

  /** `iters` integer power-iteration steps over a ×1e6 Gram map:
    * returns the ×1e9 component vector and the ×1e6 Rayleigh
    * eigenvalue. Exact BigInt arithmetic except one IEEE divide+sqrt
    * per iteration — the oracle's HUGEINT chain verbatim.
    */
  private def pcaPowerIter(gm: Map[(Int, Int), Long],
      iters: Int): (Array[BigInt], Long) = {
    val d = 64
    var v = Array.fill(d)(BigInt(125000000L))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < d) {
          acc += BigInt(gm.getOrElse((i, j), 0L)) * v(j); j += 1
        }
        acc
      }
      val norm = math.sqrt(w.map(x0 => x0 * x0).sum.doubleValue)
      v = w.map(wi =>
        BigInt(math.floor(wi.doubleValue / norm * 1e9).toLong))
    }
    val s3 = (for (i <- 0 until d; j <- 0 until d)
      yield BigInt(gm.getOrElse((i, j), 0L)) * v(i) * v(j)).sum
    val s2 = v.map(x0 => x0 * x0).sum
    (v, math.floor(s3.doubleValue / s2.doubleValue).toLong)
  }

  /** Unrolled Lloyd-iteration oracle chain for [[kmeansCentroids]]:
    * c0 = seed rows, then per iteration t — d$t distances (rounded 6),
    * a$t nearest-centroid assignment (ties → lowest c_id), x$t long-form
    * member values, m$t decimal-exact rounded means, c$t re-assembled
    * centroid lists — ending in the iteration-T long-form centroids.
    */
  private def kmeansOracleSql(k: Int, iters: Int): String =
    kmeansChainSql(k, iters) +
      s"""
         |SELECT c_id, CAST(dim_i AS INTEGER) AS dim_i, m
         |FROM m$iters ORDER BY c_id, dim_i""".stripMargin

  /** The WITH-chain of [[kmeansOracleSql]] without a final SELECT —
    * reusable prefix for any oracle consuming the trained model
    * (`m$iters` long-form means, `c$iters` list-form centroids).
    */
  private def kmeansChainSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e
         |  WHERE vec_id < $k)""".stripMargin)
    for (t <- 1 to iters) {
      sb.append(
        s""",
           |d$t AS (SELECT e.vec_id, c.c_id,
           |    round(list_sum(list_transform(range(1, len(e.v) + 1),
           |      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6)
           |      AS dist_r
           |  FROM e CROSS JOIN c${t - 1} c),
           |a$t AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id
           |      ORDER BY dist_r, c_id) AS rn FROM d$t) WHERE rn = 1),
           |x${t}0 AS (SELECT a.c_id, unnest(list_transform(
           |      range(1, len(e.v) + 1),
           |      i -> {'dim_i': i, 'x': e.v[i]})) AS u
           |  FROM a$t a JOIN e ON e.vec_id = a.vec_id),
           |x$t AS (SELECT c_id, u.dim_i AS dim_i, u.x AS x FROM x${t}0),
           |m$t AS (SELECT c_id, dim_i,
           |    round(CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE)
           |      / COUNT(*), 6) AS m
           |  FROM x$t GROUP BY c_id, dim_i),
           |c$t AS (SELECT c_id, list(m ORDER BY dim_i) AS cv
           |  FROM m$t GROUP BY c_id)""".stripMargin)
    }
    sb.toString
  }

  /** Trained k-means centroids `(c_id, dim_i, m)` after `iters` Lloyd
    * iterations from the vec_id < k seed — a Materialize artifact, so
    * training runs once per (corpus, version) and every consumer (IVF
    * cell layout, SemDeDup clustering, label-noise audits) reads the
    * same model. Empty clusters drop out of the frame (both engines
    * produce mean rows only for assigned centroids).
    */
  private[ops] def kmeansCentroids(s: SparkSession, dir: String,
      k: Int, iters: Int): DataFrame =
    graft.engine.Materialize.table(s, s"kmeans_centroids_${k}x$iters",
      dir) {
      val e = vectors(s, dir).select("vec_id", "v")
      var c: DataFrame = e.filter(col("vec_id") < k).toDF("c_id", "cv")
      var means: DataFrame = null
      for (_ <- 1 to iters) {
        val wA = Window.partitionBy("vec_id")
          .orderBy(col("dist_r"), col("c_id"))
        val assigned = e.crossJoin(broadcast(c))
          .select(col("vec_id"), col("v"), col("c_id"),
            expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
          .withColumn("rn", row_number().over(wA))
          .filter(col("rn") === 1)
          .select("c_id", "v")
        means = assigned
          .select(col("c_id"), posexplode(col("v")))
          .toDF("c_id", "p", "x")
          .groupBy(col("c_id"), (col("p") + 1).cast("int").as("dim_i"))
          .agg(round(
            sum(col("x").cast(DecimalType(38, 20))).cast("double") /
              count(lit(1)), 6).as("m"))
          .pinned
        c = means
          .groupBy("c_id")
          .agg(transform(
            array_sort(collect_list(struct(col("dim_i"), col("m")))),
            t => t.getField("m")).as("cv"))
      }
      means.select(col("c_id"), col("dim_i"), col("m"))
    }

  /** q111's trained model as ONE broadcastable row — the per-label
    * centroids (decimal-accumulated per-(label, dim) means, q55's
    * order-free frame) collected into `cents: array<struct<p_label,
    * cv>>`. The L×D model in a single row is the form a pure row-local
    * classifier can consume, which is what makes the gate
    * streaming-composable.
    */
  def prototypeModel(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("label"), posexplode(
        expr("transform(embedding, x -> cast(x as double))")))
      .toDF("label", "p", "x")
      .groupBy(col("label"), (col("p") + 1).cast("int").as("dim_i"))
      .agg(round(sum(col("x").cast(DecimalType(38, 20))).cast("double") /
        count(lit(1)), 6).as("m"))
      .groupBy(col("label").as("p_label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim_i, m))), " +
        "t -> t.m)").as("cv"))
      .agg(collect_list(struct(col("p_label"), col("cv"))).as("cents"))

  /** Row-local prototype classification: crossJoin the broadcast 1-row
    * model and argmin over the centroid array in a single projection —
    * no window, no aggregate, no state, so the SAME transform runs
    * unchanged under Structured Streaming (CurationStreamSpec asserts
    * stream == batch). Tie rule matches the q111 oracle: round-6
    * distance, then lowest label (array_sort's struct order). Input
    * must carry a double-array column `v`; all input columns pass
    * through with `p_label` and `dist_r` appended.
    */
  def classifyByPrototype(df: DataFrame, model: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val inCols = df.columns.map(col).toSeq
    df.crossJoin(broadcast(model))
      .withColumn("best", expr("array_sort(transform(cents, " +
        "c -> struct(round(vec_sqdist(v, c.cv), 6) as d, " +
        "c.p_label as l)))[0]"))
      .select(inCols :+ col("best.l").as("p_label")
        :+ col("best.d").as("dist_r"): _*)
  }

  /** q51 build: brute-force cosine top-10 for the vec_id < 5 query set —
    * the exactness baseline ANN is audited against.
    */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = vectors(s, dir)
    val q = e.filter(col("vec_id") < 5).toDF("q_id", "qv", "nq")
    val w = Window.partitionBy("q_id").orderBy(col("cos_r").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr(s"round($dot / (nq * nv), 6)").as("cos_r"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("q_id", "vec_id", "cos_r", "rn")
      .orderBy("q_id", "rn")
  }

  /** Recall@k of LSH ANN vs the exact top-k, per query: how many of the
    * true nearest neighbours did the bucketed path surface? This is THE
    * acceptance metric for any approximate index (exactness is already
    * covered by q51's oracle; an ANN that is fast but recalls nothing
    * would otherwise pass unnoticed).
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopK(s, dir).select(col("q_id"), col("vec_id"))
    val ann = annLshBucketed(vectors(s, dir), hpBuckets(s, dir),
        queryIds = 0 until 5, topK = 10)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact
      .join(ann, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
      .orderBy("q_id")
  }

  /** q56 build: IVF probe search. One `ranked` definition serves both the
    * corpus assignment (rn = 1) and the query probes (rn <= nProbe);
    * Catalyst then does the right thing with each consumer — the probe
    * side's `vec_id < 5` pushes below its window into the scan (8 rows
    * ranked), while the corpus side pre-ranks LOCALLY via
    * WindowGroupLimit before its exchange, so the assignment shuffle
    * moves one skinny (vec_id, c_id, dist) row per vector, never the
    * vector payload. Candidates = equi-join on the cell id — at scale
    * this is the partition-pruned scan of an index laid out with the
    * cell as partition key (probing nProbe of nCells ≈ scanning
    * nProbe/nCells of the corpus).
    */
  def ivfSearch(s: SparkSession, dir: String, nProbe: Int,
      topK: Int): DataFrame = {
    val e = vectors(s, dir)
    val c = e.select("vec_id", "v").filter(col("vec_id") < 8).toDF("c_id", "cv")
    val wRank = Window.partitionBy("vec_id").orderBy(col("dist_r"), col("c_id"))
    val ranked = e.select("vec_id", "v").crossJoin(broadcast(c))
      .select(col("vec_id"), col("c_id"),
        expr("round(vec_sqdist(v, cv), 6)").as("dist_r"))
      .withColumn("rn", row_number().over(wRank))
    val assign = ranked.filter(col("rn") === 1).select("vec_id", "c_id")
    val probes = ranked.filter(col("vec_id") < 5 && col("rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c_id"))
    val cand = assign.join(broadcast(probes), "c_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val q = e.filter(col("vec_id") < 5).toDF("q_id", "qv", "nq")
    val wTop = Window.partitionBy("q_id").orderBy(col("cos_r").desc, col("vec_id"))
    cand
      .join(e, "vec_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("vec_id"),
        expr(s"round($dot / (nq * nv), 6)").as("cos_r"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topK)
      .select("q_id", "vec_id", "cos_r", "rn")
      .orderBy("q_id", "rn")
  }

  /** Recall@10 of IVF probe search vs exact top-k — q57 build. */
  def ivfRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopK(s, dir).select(col("q_id"), col("vec_id"))
    val ivf = ivfSearch(s, dir, nProbe = 4, topK = 10)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact
      .join(ivf, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))
      .orderBy("q_id")
  }

  /** LSH-bucketed approximate nearest neighbours.
    *
    * 1. project: buckets = vec_hp_buckets(v, tables, bits) — one codegen'd
    *    pass computing every table's sign-bit signature.
    * 2. candidates = vectors sharing ANY table's bucket with a query
    *    (explode over tables → equi-join on (table, bucket) → distinct).
    * 3. exact cosine re-rank of candidates only.
    */
  def annLsh(vecs: DataFrame, numTables: Int, bitsPerTable: Int,
      queryIds: Seq[Int], topK: Int): DataFrame =
    annLshBucketed(vecs,
      vecs.select(col("vec_id"), posexplode(
          expr(s"vec_hp_buckets(v, $numTables, $bitsPerTable)")))
        .toDF("vec_id", "t", "bkt"),
      queryIds, topK)

  /** LSH candidate join + exact re-rank over a PRE-BUILT bucket table
    * (vec_id, t, bkt) — e.g. the materialized [[hpBuckets]] artifact, so
    * registered consumers never re-hash the corpus. [[annLsh]] is the
    * inline-bucketing form for parameter sweeps.
    */
  def annLshBucketed(vecs: DataFrame, bucketed: DataFrame,
      queryIds: Seq[Int], topK: Int): DataFrame = {
    val qSide = bucketed
      .filter(col("vec_id").isin(queryIds.map(Int.box): _*))
      .select(col("vec_id").as("q_id"), col("t"), col("bkt"))
    // Dedup multi-table collisions on the ID PAIR only — the distinct's
    // exchange then moves 16 bytes per candidate instead of two full
    // embedding vectors (at 100 TB the vector payload, not the pair
    // count, is what saturates the shuffle). Vectors re-attach after:
    // the candidate side joins the (already small) distinct pair set,
    // the query side is a broadcast of |queryIds| rows.
    val candIds = bucketed.join(broadcast(qSide), Seq("t", "bkt"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val queries = vecs
      .filter(col("vec_id").isin(queryIds.map(Int.box): _*))
      .toDF("q_id", "qv", "nq")
    val w = Window.partitionBy("q_id").orderBy(col("cos_r").desc, col("vec_id"))
    candIds
      .join(vecs, "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"),
        expr(s"round($dot / (nq * nv), 6)").as("cos_r"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .orderBy("q_id", "rn")
  }
}
