package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The sorted-distinct shingle-hash ARRAY of a string in one pass —
  * the exact-Jaccard companion of [[MinHashSignature]] (which folds
  * the same hashes into signature minima and never materializes
  * them): for each 5-byte shingle, first-32-bits(md5(shingle)) as a
  * long; the result is sorted and deduplicated, ready for the
  * codegen'd two-pointer [[SortedIntersectSize]] merge.
  *
  * Replaces `array_sort(transform(array_distinct(transform(sequence →
  * substring)), md5 → conv))` — an interpreted higher-order-function
  * chain that allocated per-shingle UTF8String substrings and
  * evaluated md5/conv as interpreted expressions per element (the
  * same trap MinHashSignature's scaladoc measures at ~4 s for
  * 5000×440 shingles at sf0.1; guide §4: keep the hot path out of
  * interpreted per-element lambdas).
  *
  * Oracle-identical to the SQL mirror (MinHash.Sql.shingleHashes +
  * list_sort): md5 of the shingle's UTF8 bytes is engine-independent,
  * byte slicing equals codepoint substring on ASCII corpora, an empty
  * string contributes the single empty shingle, and sort-then-dedupe
  * equals distinct-then-sort as a set.
  */
case class SortedShingleHashes(child: Expression, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // m ≥ 1 always: an empty string contributes one empty shingle —
    // exactly what the SQL mirror's range(1, greatest(n-4,1)+1) does
    val m = math.max(n - (shingleSize - 1), 1)
    val xs = new Array[Long](m)
    val digest = md5.get()
    var i = 0
    while (i < m) {
      digest.reset()
      digest.update(bytes, i, math.max(math.min(shingleSize, n - i), 0))
      val d = digest.digest()
      xs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(xs)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || xs(r) != xs(r - 1)) { xs(w) = xs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(xs, w))
  }

  override protected def withNewChildInternal(newChild: Expression): SortedShingleHashes =
    copy(child = newChild)
}

object SortedShingleHashes {
  def apply(c: Column, shingleSize: Int): Column =
    ColumnBridge.column(
      SortedShingleHashes(ColumnBridge.expression(c), shingleSize))
}
