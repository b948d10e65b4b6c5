package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash document fingerprint as ONE row-local expression:
  * `simhash64(text)` → `array<bigint>[4]` of 16-bit band words
  * (b0..b3, little-endian bit order within each word).
  *
  * Definition (bit-identical to the relational formulation the q92
  * DuckDB oracle runs): split on single spaces; per word occurrence,
  * bit k of the vote vector is the high bit of hex digit k of
  * sha256(word) — digit k is the high nibble of digest byte k/2 when k
  * is even, the low nibble when odd — voting +1/−1; fingerprint bit k
  * is set iff the vote sum is > 0. Band word j packs bits 16j..16j+15.
  *
  * Row-local by construction (simhash IS a per-document fold), so the
  * fingerprint evaluates inside the scan's project: no word explode, no
  * 64-column aggregate buffer, no groupBy exchange — the round-5 shape
  * paid all three, and at 100 TB the explode alone is a corpus-sized
  * intermediate. Words stay bytes end-to-end (sha256 consumes the UTF-8
  * slice directly; no hex string is ever built).
  *
  * Unpacked 4×16-bit output, not one packed BIGINT: the 16-bit word IS
  * the band join key downstream, and bit 63 of a packed long would need
  * sign-bit gymnastics in both engines.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"

  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String].split(SimHash64.Space, -1)
    val votes = new Array[Int](64)
    val md = SimHash64.digests.get()
    var w = 0
    while (w < words.length) {
      md.reset()
      val d = md.digest(words(w).getBytes)
      var k = 0
      while (k < 64) {
        val byte = d(k >> 1)
        val hi = if ((k & 1) == 0) (byte & 0x80) != 0 else (byte & 0x08) != 0
        votes(k) += (if (hi) 1 else -1)
        k += 1
      }
      w += 1
    }
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var word = 0L
      var k = 0
      while (k < 16) {
        if (votes(16 * j + k) > 0) word |= (1L << k)
        k += 1
      }
      out(j) = word
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  private val Space: UTF8String = UTF8String.fromString(" ")
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))
}
