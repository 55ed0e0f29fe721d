package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One KMV sketch slot: an md5-hex hash (32 lowercase hex chars, so
  * lexicographic order == numeric order) plus the pair-membership
  * flags the union stage needs (`in_a`/`in_b`; the build stage passes
  * zeros and ignores them).
  */
final case class KmvEntry(hu: String, in_a: Int, in_b: Int)

/** Bounded k-minimum-values selection as a typed `Aggregator` — the
  * KMV dual of [[TopKByScore]]: each input partition reduces to the
  * ≤ k smallest DISTINCT hashes per group before the shuffle, so the
  * exchange carries O(groups × k × partitions) rows instead of every
  * distinct hash sorted through a low-cardinality key window. That is
  * the difference between "sketches are O(k) per type" being a plan
  * property and being a comment.
  *
  * Duplicate hashes OR-merge their membership flags inside the sorted
  * insert (max per flag), which makes the aggregator its own dedup —
  * no upstream `distinct()` shuffle is needed: a duplicate beyond the
  * current k-th minimum cannot belong to the k smallest distinct
  * values, and one at or below it merges in place.
  *
  * `finish` emits the buffer ascending, so `element_at(-1)` is u_k
  * (the k-th minimum) for the (k-1)/u_k estimator.
  */
final class KMinHashes(k: Int)
    extends Aggregator[KmvEntry, List[KmvEntry], Seq[KmvEntry]] {

  private def insert(buf: List[KmvEntry], x: KmvEntry): List[KmvEntry] =
    if (buf.lengthCompare(k) >= 0 && buf.last.hu < x.hu) buf
    else {
      val (pre, post) = buf.span(_.hu < x.hu)
      val merged = post match {
        case h :: t if h.hu == x.hu =>
          pre ::: (KmvEntry(x.hu, h.in_a max x.in_a, h.in_b max x.in_b) :: t)
        case _ => pre ::: (x :: post)
      }
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }

  override def zero: List[KmvEntry] = Nil
  override def reduce(buf: List[KmvEntry], in: KmvEntry): List[KmvEntry] =
    insert(buf, in)
  override def merge(a: List[KmvEntry], b: List[KmvEntry]): List[KmvEntry] =
    b.foldLeft(a)(insert)
  override def finish(r: List[KmvEntry]): Seq[KmvEntry] = r
  override def bufferEncoder: Encoder[List[KmvEntry]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[KmvEntry]] = ExpressionEncoder()
}
