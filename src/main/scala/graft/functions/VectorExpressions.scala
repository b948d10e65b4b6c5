package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom codegen'd Catalyst expressions for embedding math.
  *
  * Why custom expressions (SURVEY §7.5 revisited): the HOF formulation
  * (`aggregate(zip_with(a, b, ...), ...)`) evaluates interpreted lambdas —
  * ~µs per element-step and megamorphic under many query shapes — while
  * these generate a tight primitive loop inside whole-stage codegen
  * (~ns per element). For brute-force cosine over N×K candidate pairs the
  * difference is the whole budget.
  *
  * Accumulation is a sequential left-fold in double, identical to the HOF
  * and DuckDB formulations, so oracle results are bit-equal.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** scala step: acc += step(x, y) */
  protected def step(x: Double, y: Double): Double
  /** java source for the step, parameterized on the generated (fresh)
    * element variable names so fused whole-stage codegen can never
    * shadow/collide with an outer-scope variable.
    */
  protected def stepCode(x: String, y: String): String

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc + step(x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$aGet($i);
         |  double $y = (double) $b.$bGet($i);
         |  $acc += ${stepCode(x, y)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
}

/** Σ x*y — dot product. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_dot"
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def stepCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (x-y)² — squared L2 distance. */
case class SquaredDistance(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_sqdist"
  override protected def step(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def stepCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** All sign-random-hyperplane LSH buckets of a vector in ONE codegen'd
  * loop: result[t] = the bitsPerTable-bit signature of hash table t, using
  * a deterministic splitmix64-derived weight matrix computed inline (no
  * materialized weights, no per-plane literal arrays — which cost ~20s of
  * janino compilation when expressed as 32 separate vec_dot calls).
  */
case class HyperplaneBuckets(child: Expression, numTables: Int,
    bitsPerTable: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.LongType

  override def prettyName: String = "vec_hp_buckets"
  override def dataType: DataType = ArrayType(LongType)
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bkt = 0L
      var b = 0
      while (b < bitsPerTable) {
        val plane = t * bitsPerTable + b
        var acc = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          acc += x * HyperplaneBuckets.weight(plane, d)
          d += 1
        }
        if (acc >= 0) bkt |= (1L << b)
        b += 1
      }
      out(t) = bkt
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val wFn = ctx.addNewFunction("graftPlaneWeight",
      s"""
         |private double graftPlaneWeight(int plane, int d) {
         |  long z = plane * 1000003L + d + 0x9e3779b97f4a7c15L;
         |  z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |  z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL;
         |  z = z ^ (z >>> 31);
         |  return (double) (z >>> 11) / (double) (1L << 52) * 2.0 - 1.0;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val bkt = ctx.freshName("bkt"); val plane = ctx.freshName("plane")
      s"""
         |int $dim = $a.numElements();
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $bkt = 0L;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    int $plane = $t * $bitsPerTable + $b;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += ((double) $a.$get($d)) * $wFn($plane, $d);
         |    }
         |    if ($acc >= 0) $bkt |= (1L << $b);
         |  }
         |  $out[$t] = $bkt;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object HyperplaneBuckets {
  /** Deterministic pseudo-random weight in [-1, 1): splitmix64 finalizer. */
  def weight(plane: Int, d: Int): Double = {
    var z = plane.toLong * 1000003L + d + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }
}

object VectorExpressions {
  /** Register `vec_dot` / `vec_sqdist` in the session's function registry
    * (idempotent) so they are usable from `expr(...)` and SQL.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_sqdist",
      exprs => SquaredDistance(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_hp_buckets",
      exprs => HyperplaneBuckets(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      exprs => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("shingle_strings",
      exprs => ShingleStrings(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("char_ngrams",
      exprs => CharNgrams(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("minhash_text",
      exprs => MinHashText(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }
}
