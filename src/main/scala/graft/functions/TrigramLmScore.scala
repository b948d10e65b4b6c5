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
/** Shared core of the literal-model LM scorers: type contract plus the
  * once-per-task hash index over the literal map's (token → scale-9
  * scaled-long weight) entries.
  */
trait LiteralLmScore extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // The model must be FOLDABLE (a literal / collected artifact —
      // the documented contract): the reference-equality index cache
      // below is only sound when one stable MapData instance serves
      // every row. A non-literal map column would either rebuild the
      // index per row or, under an engine reusing a mutable MapData
      // across rows, silently serve a stale index (round-6 advice) —
      // reject it at analysis time instead.
      case (StringType, MapType(StringType, DoubleType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a literal (foldable) model map — " +
            "ship the trained model as typedlit, not a per-row column")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, map<string,double>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  // Publication order matters: `index` is written BEFORE `cachedFor`,
  // and both are volatile, so a concurrent first use either misses the
  // cache (benign rebuild of the same index) or sees a fully-built one.
  @transient @volatile private var cachedFor: AnyRef = _
  @transient @volatile private var index: java.util.HashMap[UTF8String, java.lang.Long] = _

  protected def indexFor(m: MapData): java.util.HashMap[UTF8String, java.lang.Long] = {
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
      idx
    } else index
  }

  /** HALF_UP 6-decimal rounding of the exact scaled sum (optionally
    * divided by a count) — `round(cast(sum(decimal) as double) [/ n], 6)`.
    */
  protected def round6(scaledSum: Long, divisor: Long = 1L): Double =
    java.math.BigDecimal.valueOf(scaledSum.toDouble / 1e9 / divisor)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

case class TrigramLmScore(left: Expression, right: Expression)
  extends LiteralLmScore {

  override def prettyName: String = "trigram_lm_score"

  override def dataType: DataType = StructType(
    StructField("n_tri", LongType) ::
      StructField("mean_logp", DoubleType) :: Nil)

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
    InternalRow(n, round6(sum, n))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TrigramLmScore = copy(left = l, right = r)
}

/** Row-local word-unigram LM scoring against a literal model map:
  * `word_lm_score(text, map<string,double>)` →
  * `struct<n_words: bigint, logw: double>` — the DSIR gate's scorer
  * (q109's semantics: lowercase space-split words, vocabulary hits
  * counted, weights summed, rounded at 6). Zeros — not null — when no
  * word is in vocabulary, matching the previous HOF fold's contract.
  * Round 6 replaced that fold: its per-word `wmap[w]` was a LINEAR scan
  * of the map per lookup (MapData has no hash index), i.e. O(words ×
  * vocab) per document; this is O(words) against the once-per-task
  * index.
  */
case class WordLmScore(left: Expression, right: Expression)
  extends LiteralLmScore {

  override def prettyName: String = "word_lm_score"

  override def dataType: DataType = StructType(
    StructField("n_words", LongType) ::
      StructField("logw", DoubleType) :: Nil)

  override def nullSafeEval(text: Any, model: Any): Any = {
    val idx = indexFor(model.asInstanceOf[MapData])
    val words = text.asInstanceOf[UTF8String].toLowerCase
      .split(LiteralLmScore.Space, -1)
    var n = 0L
    var sum = 0L
    var i = 0
    while (i < words.length) {
      val lw = idx.get(words(i))
      if (lw != null) { n += 1; sum += lw.longValue() }
      i += 1
    }
    InternalRow(n, round6(sum))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): WordLmScore = copy(left = l, right = r)
}

object LiteralLmScore {
  val Space: UTF8String = UTF8String.fromString(" ")
}
