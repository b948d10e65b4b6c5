package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def df = {
    VectorExpressions.register(spark)
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.5f, -1.5f, 2.5f), Array(-1.0, 0.0, 2.0)))
      .toDF("id", "vf", "vd")
  }

  test("vec_dot matches the HOF formulation bitwise (float × double)") {
    val got = df.select(expr("vec_dot(vf, vd)").as("d"),
      expr("aggregate(zip_with(transform(vf, x -> cast(x as double)), vd, " +
        "(x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got.head.getDouble(0) == 1.0 * 4 + 2 * 5 + 3 * 6)
  }

  test("vec_sqdist computes Σ(x-y)²") {
    val got = df.filter($"id" === 1)
      .select(expr("vec_sqdist(vf, vd)")).head().getDouble(0)
    assert(got == 9.0 + 9.0 + 9.0)
  }

  test("vec_hp_buckets is deterministic, bounded, and table-count sized") {
    val b1 = df.select(expr("vec_hp_buckets(vf, 4, 8)")).collect()
      .map(_.getSeq[Long](0))
    val b2 = df.select(expr("vec_hp_buckets(vf, 4, 8)")).collect()
      .map(_.getSeq[Long](0))
    assert(b1.toSeq.map(_.toSeq) == b2.toSeq.map(_.toSeq))
    assert(b1.forall(_.length == 4))
    assert(b1.flatten.forall(b => b >= 0 && b < 256))
  }

  test("codegen and interpreted eval agree") {
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 11.0) // interpreted path
    val viaPlan = df.limit(1)
      .select(expr("vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))"))
      .head().getDouble(0) // codegen path
    assert(viaPlan == 11.0)
  }

  test("HyperplaneBuckets.sign equals exact BigInt arithmetic at every " +
      "k, including past the 64-bit product overflow (round-6 advice)") {
    // The masked reduction must equal the MATHEMATICAL
    // (k²·C1 + k·C2) mod 2³² everywhere — the old signed % diverged
    // once k*k*C1 overflowed a long (k >= 64,071).
    val C1 = BigInt(2246822519L); val C2 = BigInt(3266489917L)
    val M = BigInt(1) << 32
    def exact(k: Long): Long = {
      val kk = BigInt(k)
      if ((kk * kk * C1 + kk * C2).mod(M) < (M >> 1)) 1L else -1L
    }
    val ks = (0L to 200L) ++ Seq(64069L, 64070L, 64071L, 64072L,
      100000L, 1000000L, Int.MaxValue.toLong, (1L << 40) + 12345L)
    ks.foreach { k =>
      assert(HyperplaneBuckets.sign(k) == exact(k),
        s"sign($k) diverges from exact mod-2^32 arithmetic")
    }
  }

  test("analysis-time guards reject misuse (round-6 advice): " +
      "minhash_sig over non-strings / bad numPerms, non-literal LM model") {
    VectorExpressions.register(spark)
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("guard_docs")
    // minhash_sig over the LONG output of shingle_hashes: analysis
    // error, not a runtime ClassCastException
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(h, 4) FROM (SELECT doc_id, h " +
        "FROM guard_docs LATERAL VIEW shingle_hashes(text, 3) AS pos, h)" +
        " GROUP BY doc_id").collect()
    }
    // numPerms beyond the 64-permutation sha-window family
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(text, 65) FROM guard_docs " +
        "GROUP BY doc_id").collect()
    }
    // a NON-literal model map must be rejected: the index cache is
    // only sound for a stable literal MapData
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(expr(
        "trigram_lm_score(text, map(text, 1.0D))")).collect()
    }
    // the literal form still works
    val ok = docs.select(expr(
      "trigram_lm_score(text, map('a b', -1.0D))")).head()
    assert(ok != null)
  }
}
