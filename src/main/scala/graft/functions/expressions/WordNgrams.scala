package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word n-grams of a raw text column ("w1 … wn", single-space
  * joined) in ONE pass per row — the contamination-check unit at
  * native speed.
  *
  * Tokenization is byte-identical to `TextFunctions.tokens` (split on
  * runs of Java `\s` = [ \t\n\x0B\f\r], empty tokens dropped): those
  * class members are all ASCII, and UTF-8 continuation bytes are
  * ≥ 0x80, so a byte scan can never split inside a multi-byte
  * codepoint. The HOF equivalent (4 nested interpreted `zip_with`s
  * over 5 `slice`s for n = 5) allocates four intermediate arrays and
  * ~4·tokens lambda frames per row; this emits each gram with one
  * `UTF8String.fromBytes` copy. Same CodegenFallback stance as
  * [[PackedTrigrams]]: the per-row loop is the work, expression
  * dispatch is one call per row.
  *
  * Fewer than n tokens → empty array (matches the HOF and the DuckDB
  * `range` comprehension).
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 2, s"WordNgrams needs n >= 2, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // token spans [start, end)
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts.add(i)
        while (i < len && !isWs(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val t = starts.size()
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t - n + 1)
    var g = 0
    while (g <= t - n) {
      var sz = n - 1 // the (n-1) joining spaces
      var j = 0
      while (j < n) { sz += ends.get(g + j) - starts.get(g + j); j += 1 }
      val buf = new Array[Byte](sz)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(p) = 0x20; p += 1 }
        val s = starts.get(g + j)
        val e = ends.get(g + j)
        System.arraycopy(bytes, s, buf, p, e - s)
        p += e - s
        j += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))
}
