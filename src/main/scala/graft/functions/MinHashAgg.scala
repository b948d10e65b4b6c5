package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE aggregate: folds shingle STRING rows (e.g.
  * from the `shingle_strings` generator) into a numPerms-wide
  * min-signature buffer in a single pass, using the same oracle-portable
  * sha256-window permutation family as the row-local `minhash_text`
  * ([[MinHashSha]]) — MinHashTextSpec asserts the two are bit-identical.
  *
  * This is the `TypedImperativeAggregate` tier of the custom-operator
  * ladder: the buffer (long[numPerms]) is mutable across rows, merges are
  * elementwise min (commutative/associative → partition-order
  * independent), and partial aggregation works map-side like any
  * built-in. Compared to numPerms separate `min(substr(sha2(...)))`
  * columns it hashes the shingle once per digest instead of once per
  * permutation and keeps one buffer instead of numPerms aggregate slots.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "minhash_sig"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  // Analysis-time guards (round-6 advice): the fold casts its input to
  // UTF8String — a non-string child (e.g. the LONG output of
  // shingle_hashes) must fail analysis, not throw ClassCastException at
  // runtime; and the sha-window permutation family supplies 64
  // permutations at most (MinHashSha.prefixes covers 9 digests × 8
  // windows, but [[MinHashText]] caps at 64 and the two must agree).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING shingle column (e.g. from " +
          s"shingle_strings), got ${child.dataType.catalogString}")
    else if (numPerms < 1 || numPerms > 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= numPerms <= 64, got $numPerms")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input:
      org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      MinHashSha.fold(v.asInstanceOf[UTF8String].getBytes, numPerms, buf)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerms) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}
