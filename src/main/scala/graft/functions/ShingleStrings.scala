package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one row `(pos: int, sh: string)` per word n-gram
  * of a text column (pos is the 1-based word position of the n-gram's
  * first word) — the string twin of [[ShingleHashes]] for consumers that
  * need the shingle TEXT (boilerplate detection reports the offending
  * n-gram; a hash could not be shown to a human or matched against a
  * denylist) or its POSITION (span-level repeated-region detection in
  * q125 merges consecutive repeating positions into cut spans).
  *
  * Row-local like its twin: shingle rows stream into the downstream
  * aggregate with no shuffle and no interpreted HOF lambda in the hot
  * path (the `transform(sequence(...), i -> array_join(slice(...)))`
  * formulation this replaced evaluated an interpreted lambda per n-gram
  * and measured 3.7 s at sf0.1 vs sub-second for the generator).
  * Same `split(' ')` tokenization; n-gram = words joined by one space.
  */
case class ShingleStrings(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "shingle_strings"

  override def elementSchema: StructType =
    StructType(StructField("pos", IntegerType) ::
      StructField("sh", StringType) :: Nil)

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
    val words = v.asInstanceOf[UTF8String].split(ShingleStrings.Space, -1)
    val last = words.length - n
    if (last < 0) return Iterator.empty
    (0 to last).iterator.map { i =>
      InternalRow(i + 1, UTF8String.concatWs(ShingleStrings.Space,
        words.slice(i, i + n).toIndexedSeq: _*))
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleStrings =
    copy(child = c)
}

object ShingleStrings {
  private val Space: UTF8String = UTF8String.fromString(" ")
}
