package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATE sketch as one aggregate: folds a
  * string key stream into a capacity-bounded (item → counter) summary.
  * The buffer never exceeds `capacity` entries regardless of key-space
  * size — that bound, not the counters, is the point: at 100 TB the
  * frequency pass over a Heaps-law vocabulary shuffles the ENTIRE key
  * space, while this pass moves one ≤capacity summary per partition and
  * merges them associatively (Agarwal et al., "Mergeable Summaries",
  * PODS'12).
  *
  * Deterministic guarantee (any input/merge order): every item with true
  * frequency f > N/(capacity+1) survives in the final summary, because
  * each decrement/offset step retires capacity+1 units of total count.
  * The SURVIVING SET BEYOND that guarantee — and every counter value —
  * depends on partition and merge order, so the sketch output is a
  * candidate SUPERSET, not an answer: consumers must semi-join it back
  * for an exact recount (the q159 shape), which makes the composed
  * result deterministic and exact for any threshold φ ≥ 1/(capacity+1).
  * Accordingly `eval` returns ONLY the items (sorted for a stable
  * in-row layout), never the order-dependent counters.
  *
  * update: amortized O(1) per row (each full-buffer decrement retires
  * capacity+1 count units, so decrements total ≤ N/(capacity+1)).
  * merge: counters add pointwise; overflow subtracts the
  * (capacity+1)-largest counter from all (the mergeable-summaries
  * offset step) and drops non-positive entries.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def prettyName: String = "mg_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING key column, got " +
          child.dataType.catalogString)
    else if (capacity < 1 || capacity > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= capacity <= ${1 << 20}, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.get(k) match {
        case Some(c) => buf.update(k, c + 1L)
        case None if buf.size < capacity => buf.update(k, 1L)
        case None =>
          // Full and key absent: decrement every counter (the incoming
          // unit cancels against one unit of each survivor), dropping
          // zeros. Retires capacity+1 total units -> amortized O(1).
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (_, c) => c - 1L }
          buf.foreach { case (k2, c) => if (c <= 0L) dead += k2 }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) =>
      a.update(k, a.getOrElse(k, 0L) + c)
    }
    if (a.size > capacity) {
      // Offset step: subtract the (capacity+1)-th largest counter from
      // all, drop non-positives -> size <= capacity, error bound keeps
      // summing across merges to <= N/(capacity+1).
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (_, c) => c - offset }
      a.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted
        .map(k => UTF8String.fromString(k): AnyRef))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.iterator.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }.toArray
    val bb = ByteBuffer.allocate(
      4 + items.map(8 + 4 + _._1.length).sum)
    bb.putInt(items.length)
    items.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]):
      mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGries = copy(child = c.head)
}
