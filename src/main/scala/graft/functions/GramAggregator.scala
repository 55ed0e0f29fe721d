package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One upper-triangle Gram entry: G[i][j] = Σ_vec codes[i]·codes[j]. */
final case class GramEntry(i: Int, j: Int, g: Long)

/** Distributed Gram (covariance-without-centering) matrix over int8
  * code vectors — the SCALE-HARD half of PCA/spectral steps: one pass
  * over the data accumulates the dim×dim products per partition
  * (map-side), partial buffers merge as flat Long arrays, and only
  * dim(dim+1)/2 numbers ever cross the wire — the MLlib
  * computeGramianMatrix shape as a typed [[Aggregator]]. The
  * downstream eigensolve is a driver-trivial dim×dim problem and
  * deliberately out of scope (it has no 100 TB dimension).
  *
  * Integer domain on purpose: products of int8 codes sum exactly in
  * Longs (no FP order sensitivity), so the full matrix is
  * hash-checkable cross-engine — the same exact-shadow trick as
  * MediaFeatures.hist.
  */
final class GramAggregator(dim: Int)
    extends Aggregator[Seq[Int], Array[Long], Seq[GramEntry]] {

  private val n = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](n)

  override def reduce(buf: Array[Long], codes: Seq[Int]): Array[Long] = {
    require(codes.length == dim, s"expected $dim lanes, got ${codes.length}")
    val c = codes.toArray
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        buf(k) += c(i).toLong * c(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < n) { a(k) += b(k); k += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[GramEntry] = {
    val out = Vector.newBuilder[GramEntry]
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out += GramEntry(i, j, buf(k))
        k += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[GramEntry]] = ExpressionEncoder()
}
