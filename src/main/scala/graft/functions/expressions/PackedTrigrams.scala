package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, distinct 3-byte shingles of a string packed into ints
  * (b₀·2¹⁶ + b₁·2⁸ + b₂) — one tight loop + primitive sort per row.
  *
  * The equivalent HOF chain
  * (`transform(sequence(...), i -> ascii(substring(...)) * …)` inside
  * `array_sort(array_distinct(...))`) is interpreted per *element*:
  * measured 5 s for 5000 documents at sf0.1 — and a self-join pays it
  * once per side. This expression does the same work in one call per
  * row (~100 ms for the same input). CodegenFallback: the per-row loop
  * is the work; expression-dispatch overhead is irrelevant at one call
  * per row.
  *
  * Byte-based packing equals the codepoint-based oracle formula on
  * ASCII text (the driver corpus); non-ASCII bytes still produce a
  * deterministic (byte-wise) shingling. Strings shorter than 3 bytes
  * produce one zero-padded shingle (n = 0 → the single shingle 0,
  * matching ascii('') = 0 in the SQL mirror).
  */
case class PackedTrigrams(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // empty string → one zero shingle, matching the SQL mirror where
    // ascii('') = 0 and the comprehension always yields ≥1 element
    if (n == 0) return new GenericArrayData(Array(0))
    val m = math.max(n - 2, 1)
    val arr = new Array[Int](m)
    var i = 0
    while (i < m) {
      val b0 = bytes(i) & 0xff
      val b1 = if (i + 1 < n) bytes(i + 1) & 0xff else 0
      val b2 = if (i + 2 < n) bytes(i + 2) & 0xff else 0
      arr(i) = b0 * 65536 + b1 * 256 + b2
      i += 1
    }
    java.util.Arrays.sort(arr)
    var k = 0
    var j = 0
    while (j < m) {
      if (j == 0 || arr(j) != arr(j - 1)) { arr(k) = arr(j); k += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, k))
  }

  override protected def withNewChildInternal(newChild: Expression): PackedTrigrams =
    copy(child = newChild)
}

object PackedTrigrams {
  def apply(c: Column): Column =
    ColumnBridge.column(PackedTrigrams(ColumnBridge.expression(c)))
}
