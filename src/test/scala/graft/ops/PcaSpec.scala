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
}
