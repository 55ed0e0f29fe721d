package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Complete k-value MinHash signature of a string in ONE pass:
  * for each 5-byte shingle, x = first-32-bits(md5(shingle)) and every
  * signature slot i updates min((aᵢ·x + bᵢ) mod P).
  *
  * Replaces an interpreted pipeline of
  * `transform(distinct(transform(sequence → substring)), md5 → conv)`
  * plus 16 `array_min(transform(...))` passes — ~4 s for 5000×440
  * shingles at sf0.1, vs ~0.5 s here (MessageDigest reused per
  * thread, no intermediate arrays).
  *
  * Oracle-identical to the per-step SQL mirror (MinHash.Sql):
  *  - md5 of the shingle's UTF8 bytes is engine-independent; byte
  *    slicing equals codepoint substring on ASCII corpora;
  *  - skipping the `distinct` step is sound because duplicate
  *    shingles cannot change a minimum.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  import graft.functions.MinHash.{hashA, hashB, Prime}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val sig = Array.fill(numHashes)(Long.MaxValue)
    // m ≥ 1 always: an empty string contributes one empty shingle
    // (md5("")) — exactly what the SQL mirror's
    // range(1, greatest(n-4,1)+1) → substring produces.
    val m = math.max(n - (shingleSize - 1), 1)
    val digest = md5.get()
    var i = 0
    while (i < m) {
      digest.reset()
      digest.update(bytes, i, math.max(math.min(shingleSize, n - i), 0))
      val d = digest.digest()
      val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var h = 0
      while (h < numHashes) {
        val v2 = (x * hashA(h) + hashB(h)) % Prime
        if (v2 < sig(h)) sig(h) = v2
        h += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(c: Column, numHashes: Int, shingleSize: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(c), numHashes, shingleSize))
}
