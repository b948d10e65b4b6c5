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
}
