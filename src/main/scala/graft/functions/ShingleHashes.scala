package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator,
  UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one row `(h: bigint)` per word n-gram ("shingle") of a
  * text column — the shuffle-free shingle builder for MinHash pipelines.
  *
  * Semantics are bit-identical to the compositional formulation
  * `posexplode(split(text, ' '))` + two window `lead`s +
  * `xxhash64(w, w1, w2)`: the same regex-split tokenization and the same
  * left-fold xxhash64 (seed 42) over the n consecutive words. The
  * difference is the plan: the window formulation costs a full-corpus
  * Exchange + sort on doc_id *before any reduction*, while a Generate is
  * row-local — shingle hashes stream straight into the (map-side partial)
  * MinHash aggregate with zero shuffles before the per-doc groupBy. At
  * 100 TB that removes the single largest data movement in the dedup
  * pipeline: the shuffle of every shingle *occurrence*.
  *
  * Emits one row per occurrence (not distinct-per-doc), matching the
  * compositional shape; MinHash is insensitive to duplicate shingles
  * (min is idempotent).
  *
  * Interpreted-only (CodegenFallback), like most built-in generators
  * (`JsonTuple`, `Stack`); the per-row work is a tight loop over
  * UTF8String slices, and the downstream aggregate is codegen'd.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "shingle_hashes"

  override def elementSchema: StructType =
    StructType(StructField("h", LongType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.sql}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    // Same tokenization as split(text, ' ') with the default -1 limit.
    val words = v.asInstanceOf[UTF8String].split(ShingleHashes.Space, -1)
    val last = words.length - n
    if (last < 0) return Iterator.empty
    (0 to last).iterator.map { i =>
      // Left-fold identical to the XxHash64 expression over n children.
      var h = 42L
      var j = 0
      while (j < n) {
        h = XxHash64Function.hash(words(i + j), StringType, h)
        j += 1
      }
      InternalRow(h)
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

object ShingleHashes {
  private val Space: UTF8String = UTF8String.fromString(" ")
}
