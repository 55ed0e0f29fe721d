package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash fingerprint of a document in ONE pass: tokenize on
  * whitespace runs, hash each token (first 32 md5 bits — the engine's
  * canonical `tokenHash`), accumulate a ±1 counter per bit position,
  * emit Σ_b [cnt_b > 0]·2^b. NULL for a tokenless document — the
  * explode-based formulation this replaces produced no row for such a
  * document, and callers filter the NULL to keep that contract.
  *
  * Replaces explode → md5 → groupBy(doc_id) with 16 sum aggregates:
  * that shape shuffles every token row and carries a 16-column
  * aggregation buffer per doc — the widest aggregation row in the
  * engine and the suite's worst raw-pass noise amplifier under
  * co-tenant load (BENCH_r09: 102 s raw vs 0.88 s best). Here the
  * whole fingerprint is a pure map over the scan: zero shuffle, zero
  * aggregation state, same number (the bit-counter accumulation is
  * integer, order-independent). Same CodegenFallback rationale as
  * [[MinHashSignature]]: the per-row token loop is the work.
  *
  * Oracle-identical to the unnest + 16-sums SQL mirror: Java
  * `\\s+`-split-then-drop-empties equals Spark's
  * `filter(split(text,"\\s+"), _ != "")` and DuckDB's
  * regexp_split + filter; md5 bytes are engine-independent.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](16)
    var seen = false
    val digest = md5.get()
    val parts = text.split("\\s+")
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) {
        seen = true
        digest.reset()
        val d = digest.digest(t.getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 16) {
          counts(b) += (((h >> b) & 1L).toInt * 2 - 1)
          b += 1
        }
      }
      i += 1
    }
    if (!seen) null
    else {
      var fp = 0L
      var b = 0
      while (b < 16) {
        if (counts(b) > 0) fp |= 1L << b
        b += 1
      }
      fp
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(c)))
}
