package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature of a text column as ONE row-local expression:
  * `minhash_text(text, n, numPerms)` → `array<bigint>[numPerms]`.
  *
  * The permutation family is ORACLE-PORTABLE (round-5 verdict, next 4):
  * permutation p of shingle s (n consecutive words joined by one space)
  * is the p%8-th 32-bit big-endian window of sha256 digest p/8, where
  * digest 0 = sha256(s) and digest j = sha256(j || '|' || s) — i.e.
  * exactly `substr(sha256(...), (p%8)*8+1, 8)` of the hex form, parsed
  * as an unsigned 32-bit value. min over shingle VALUES equals min over
  * the multiset of occurrences, and fixed-width lowercase hex compares
  * lexicographically like its numeric value, so ANSI SQL (DuckDB
  * included) reproduces every signature entry exactly — which is what
  * lets q44/q47 carry full hash oracles instead of rows-only checks.
  * (The previous xxhash64+splitmix family was unexpressible outside the
  * JVM.)
  *
  * Bit-identical to the compositional pipeline `shingle_strings(text,n)`
  * (explode) → `minhash_sig(s, numPerms)` (groupBy doc) —
  * MinHashTextSpec asserts the equality. What changes is the PLAN: the
  * aggregate formulation needs a per-doc groupBy (one exchange of a sig
  * row per doc), while this evaluates inside the scan's whole-stage
  * project — zero shuffles until LSH banding, and it works in a
  * streaming SELECT where a stateful aggregate would need watermarked
  * state per doc.
  *
  * Texts with fewer than n words yield NULL (the aggregate path drops
  * such docs — no shingle rows means no group; callers filter nulls,
  * which is the same contract).
  *
  * Interpreted (CodegenFallback) like the ShingleHashes generator: the
  * per-row work is a tight primitive loop over digest bytes (no hex
  * string is ever built), and fallback keeps the surrounding project
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
    else if (n < 1 || numPerms < 1 || numPerms > 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n >= 1 and 1 <= numPerms <= 64, got ($n, $numPerms)")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String].split(MinHashSha.Space, -1)
    val last = words.length - n
    if (last < 0) return null
    val wb = new Array[Array[Byte]](words.length)
    var w = 0
    while (w < words.length) { wb(w) = words(w).getBytes; w += 1 }
    val sig = Array.fill(numPerms)(Long.MaxValue)
    val shingle = new java.io.ByteArrayOutputStream(64)
    var i = 0
    while (i <= last) {
      shingle.reset()
      var j = 0
      while (j < n) {
        if (j > 0) shingle.write(' ')
        shingle.write(wb(i + j), 0, wb(i + j).length)
        j += 1
      }
      MinHashSha.fold(shingle.toByteArray, numPerms, sig)
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashText =
    copy(child = c)
}

/** Shared sha256-window permutation family of the minhash pair
  * (`minhash_text` row-local / `minhash_sig` aggregate).
  */
object MinHashSha {
  val Space: UTF8String = UTF8String.fromString(" ")

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** UTF-8 bytes of the digest-chain prefixes: j → "j|". */
  private val prefixes: Array[Array[Byte]] =
    (0 to 8).map(j => s"$j|".getBytes("UTF-8")).toArray

  /** Fold one shingle's permutation values into the running min
    * signature: value p = 32-bit big-endian window p%8 of digest p/8.
    */
  def fold(shingle: Array[Byte], numPerms: Int, sig: Array[Long]): Unit = {
    val md = digests.get()
    var p = 0
    while (p < numPerms) {
      val j = p >> 3
      md.reset()
      if (j > 0) md.update(prefixes(j))
      val d = md.digest(shingle)
      val top = math.min(numPerms, (j + 1) << 3)
      while (p < top) {
        val w = (p & 7) << 2
        val v = ((d(w) & 0xffL) << 24) | ((d(w + 1) & 0xffL) << 16) |
          ((d(w + 2) & 0xffL) << 8) | (d(w + 3) & 0xffL)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
    }
  }
}
