package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a token array in ONE native pass: md5
  * each space-joined `g`-gram, keep the minimum hash of every
  * `w`-gram window, distinct (first-occurrence order). Fuses the
  * interpreted chain
  * `array_distinct(transform(sequence, i → array_min(slice(
  *   transform(ngrams(toks, g), md5), i, w))))`
  * whose per-element lambdas evaluated md5/concat_ws/slice as
  * interpreted expressions (guide §4) — the same class of trap
  * [[MinHashSignature]] and [[SortedShingleHashes]] close for
  * shingles.
  *
  * Exactness: the g-gram is the tokens joined by single spaces
  * (tokens carry no whitespace — they come from a `\\s+` split);
  * md5 hex is engine-independent; window minima compare md5 digests
  * as unsigned bytes, which equals lexicographic order of the
  * lowercase-hex strings Spark's `array_min` compares; `< g` tokens
  * yield zero g-grams and `< w` hashes yield zero windows — both
  * produce an empty array, exactly like the interpreted chain after
  * its `when(nw >= 1, …)` guard. WinnowFingerprintsSpec pins
  * equality against the interpreted spelling.
  */
case class WinnowFingerprints(child: Expression, g: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".getBytes

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = n - (g - 1) // g-gram count
    if (m < w) return new GenericArrayData(Array.empty[Any])
    // md5 digests of the g-grams as (hi, lo) unsigned-comparable pairs
    val hi = new Array[Long](m)
    val lo = new Array[Long](m)
    val digest = md5.get()
    val space = Array[Byte](' ')
    var i = 0
    while (i < m) {
      digest.reset()
      var j = 0
      while (j < g) {
        if (j > 0) digest.update(space)
        digest.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = digest.digest()
      var h = 0L
      var l = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      while (b < 16) { l = (l << 8) | (d(b) & 0xffL); b += 1 }
      hi(i) = h
      lo(i) = l
      i += 1
    }
    @inline def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Long.compareUnsigned(hi(a), hi(b))
      c < 0 || (c == 0 && java.lang.Long.compareUnsigned(lo(a), lo(b)) < 0)
    }
    // sliding min over w-windows, distinct in first-occurrence order
    val seen = new java.util.LinkedHashSet[(Long, Long)]()
    var s = 0
    val nw = m - (w - 1)
    while (s < nw) {
      var best = s
      var k = s + 1
      while (k < s + w) {
        if (less(k, best)) best = k
        k += 1
      }
      seen.add((hi(best), lo(best)))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      val (h, l) = it.next()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 8) {
        hex(2 * b) = hexDigits(((h >>> (56 - 8 * b)) & 0xf0L).toInt >>> 4)
        hex(2 * b + 1) = hexDigits(((h >>> (56 - 8 * b)) & 0x0fL).toInt)
        b += 1
      }
      while (b < 16) {
        val byte = ((l >>> (56 - 8 * (b - 8))) & 0xffL).toInt
        hex(2 * b) = hexDigits(byte >>> 4)
        hex(2 * b + 1) = hexDigits(byte & 0x0f)
        b += 1
      }
      out(o) = UTF8String.fromBytes(hex)
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  def apply(c: Column, g: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expression(c), g, w))
}
