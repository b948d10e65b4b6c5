package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one row `(pos: int, t: string)` per CHARACTER
  * n-gram of a text column (pos is 1-based, matching SQL `substring`) —
  * the char-level sibling of [[ShingleStrings]], feeding n-gram
  * language-model scoring (q94) and winnowing-style fingerprint
  * selection (q95, which needs the position to window over).
  *
  * Why not `transform(sequence(1, length-n+1), i -> substring(...))`:
  * the HOF lambda evaluates interpreted per n-gram (PERF.md finding 2),
  * and the explode-positions-then-substring form carries the FULL text
  * through the Generate output — one copy per position, ~length² bytes
  * per document. This generator emits only the n-char slices, one pass,
  * no duplication.
  */
case class CharNgrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "char_ngrams"

  override def elementSchema: StructType =
    StructType(StructField("pos", IntegerType) ::
      StructField("t", StringType) :: Nil)

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
    val s = v.asInstanceOf[UTF8String]
    // One O(bytes) boundary walk, then each n-gram is a bounded byte
    // copy. (substringSQL per position re-walks from byte 0 every call —
    // O(chars²) per document; measured ~2 s for a 1.5 MB corpus, i.e.
    // the whole cost of the round-5 trigram queries.)
    val bytes = s.getBytes
    val nChars = s.numChars()
    val last = nChars - n
    if (last < 0) return Iterator.empty
    val bounds = new Array[Int](nChars + 1)
    var c = 0
    var off = 0
    while (c < nChars) {
      bounds(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    bounds(nChars) = bytes.length
    (0 to last).iterator.map { i =>
      val a = bounds(i)
      val b = bounds(i + n)
      InternalRow(i + 1, UTF8String.fromBytes(bytes, a, b - a))
    }
  }

  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(child = c)
}
