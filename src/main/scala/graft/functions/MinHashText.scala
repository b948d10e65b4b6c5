package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature of a text column as ONE row-local expression:
  * `minhash_text(text, n, numPerms)` → `array<bigint>[numPerms]`.
  *
  * Bit-identical to the compositional pipeline
  * `shingle_hashes(text, n)` (explode) → `minhash_sig(h, numPerms)`
  * (groupBy doc): same `split(' ')` tokenization, same left-fold
  * xxhash64 (seed 42) per n-gram, same splitmix64 permutation mix —
  * MinHashTextSpec asserts equality against that composition. What
  * changes is the PLAN: the aggregate formulation needs a per-doc
  * groupBy (one exchange of a sig row per doc, plus the doc_id carried
  * on every shingle row), while this evaluates inside the scan's
  * whole-stage project — zero shuffles until LSH banding, and it works
  * in a streaming SELECT where a stateful aggregate would need
  * watermarked state per doc.
  *
  * Texts with fewer than n words yield NULL (the aggregate path drops
  * such docs — no shingle rows means no group; callers filter nulls,
  * which is the same contract).
  *
  * Interpreted (CodegenFallback) like the ShingleHashes generator: the
  * per-row work is a tight primitive loop (~words × numPerms mixes) with
  * no lambda dispatch, and fallback keeps the surrounding project
  * codegen'd.
  */
case class MinHashText(child: Expression, n: Int, numPerms: Int)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_text"

  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.sql}")
    else if (n < 1 || numPerms < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n >= 1 and numPerms >= 1, got ($n, $numPerms)")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String].split(MinHashText.Space, -1)
    val last = words.length - n
    if (last < 0) return null
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i <= last) {
      var h = 42L
      var j = 0
      while (j < n) {
        h = XxHash64Function.hash(words(i + j), StringType, h)
        j += 1
      }
      var p = 0
      while (p < numPerms) {
        val m = MinHashAgg.mix(h, p)
        if (m < sig(p)) sig(p) = m
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashText =
    copy(child = c)
}

object MinHashText {
  private val Space: UTF8String = UTF8String.fromString(" ")
}
