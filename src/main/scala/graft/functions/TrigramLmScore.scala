package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, MapType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local char-trigram LM scoring against a literal model map:
  * `trigram_lm_score(text, map<string,double>)` →
  * `struct<n_tri: bigint, mean_logp: double>` — the STREAMING form of
  * q94's scorer: the model trains batch-side (the materialized
  * `trigram_lm` artifact) and scoring is a pure projection, so a text
  * stream can be perplexity-gated per micro-batch with the exact batch
  * semantics (TrigramGateSpec asserts stream == batch AND row-identity
  * with the q94 frame on corpus data).
  *
  * Bit-equality with q94's decimal aggregate: each log-probability is a
  * scale-9 decimal by construction (the artifact rounds at 9), so the
  * fold runs over floor(lp·10⁹ + 0.5) scaled longs — exact integer
  * addition in any evaluation order; the mean divides the
  * correctly-rounded double of the exact sum by the count and rounds
  * HALF_UP at 6, which is precisely `round(cast(sum(decimal) as
  * double) / count, 6)`.
  *
  * Trigrams the model has never seen are SKIPPED (the batch frame's
  * inner join drops them identically); a row with no scored trigram
  * (too short, or fully out-of-distribution) yields NULL — the gate's
  * "cannot score" verdict, which a caller filters or routes.
  *
  * The model arrives as a LITERAL map (`typedlit` from the collected
  * artifact — the "ship the trained model with the job" pattern), so
  * the MapData instance is stable across rows and the expression builds
  * its O(1) hash index once per task — a per-row `element_at` against
  * MapData would be a linear scan per trigram.
  */
case class TrigramLmScore(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "trigram_lm_score"

  override def dataType: DataType = StructType(
    StructField("n_tri", LongType) ::
      StructField("mean_logp", DoubleType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, MapType(StringType, DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, map<string,double>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  @transient private var cachedFor: AnyRef = _
  @transient private var index: java.util.HashMap[UTF8String, java.lang.Long] = _

  private def indexFor(m: MapData): java.util.HashMap[UTF8String, java.lang.Long] = {
    if (!(m.asInstanceOf[AnyRef] eq cachedFor)) {
      val idx = new java.util.HashMap[UTF8String, java.lang.Long](m.numElements() * 2)
      val ks = m.keyArray(); val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        idx.put(ks.getUTF8String(i).clone(),
          java.lang.Long.valueOf(math.floor(vs.getDouble(i) * 1e9 + 0.5).toLong))
        i += 1
      }
      index = idx
      cachedFor = m.asInstanceOf[AnyRef]
    }
    index
  }

  override def nullSafeEval(text: Any, model: Any): Any = {
    val idx = indexFor(model.asInstanceOf[MapData])
    val s = text.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nChars = s.numChars()
    if (nChars < 3) return null
    val bounds = new Array[Int](nChars + 1)
    var c = 0
    var off = 0
    while (c < nChars) {
      bounds(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    bounds(nChars) = bytes.length
    var n = 0L
    var sum = 0L
    var i = 0
    while (i <= nChars - 3) {
      val a = bounds(i)
      val lp = idx.get(UTF8String.fromBytes(bytes, a, bounds(i + 3) - a))
      if (lp != null) { n += 1; sum += lp.longValue() }
      i += 1
    }
    if (n == 0) return null
    val mean = java.math.BigDecimal.valueOf(sum.toDouble / 1e9 / n)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    InternalRow(n, mean)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TrigramLmScore = copy(left = l, right = r)
}
