package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate for top-k selection (cos desc, vec_id asc). */
final case class Scored(vec_id: Long, cos: Double)

/** Bounded top-k as a typed `Aggregator`, so `groupByKey(query).agg`
  * gets *map-side partial aggregation*: each input partition reduces
  * its candidates to ≤ k rows per query before the shuffle, so the
  * exchange moves Q×k×partitions rows instead of the full Q×N scored
  * cross product — the difference between a rank-window plan and one
  * that survives a 100 TB corpus scan per query batch.
  *
  * The buffer is a best-first sorted list capped at k (k is small —
  * top-k search, not sorting); `finish` emits it rank-ordered so a
  * `posexplode` downstream yields the rank directly.
  */
final class TopKByScore(k: Int)
    extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)

  /** NaN scores (e.g. cosine against a zero-norm vector) are excluded
    * up front: `better`'s `>` is false on NaN in either position, which
    * would otherwise let a NaN candidate prepend itself above real
    * scores. Exclusion — not "sorts last" — is the contract.
    */
  private def insert(buf: List[Scored], x: Scored): List[Scored] =
    if (x.cos.isNaN) buf
    else if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }

  override def zero: List[Scored] = Nil
  override def reduce(buf: List[Scored], in: Scored): List[Scored] = insert(buf, in)
  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(insert)
  override def finish(r: List[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
