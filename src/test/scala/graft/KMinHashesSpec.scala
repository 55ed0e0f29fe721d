package graft

import graft.functions.{KMinHashes, KmvEntry}
import org.scalatest.funsuite.AnyFunSuite

/** Algebra of the bounded k-min aggregator: the KMV plan-shape fix is
  * only sound if reduce/merge keep the k smallest DISTINCT hashes with
  * OR-merged flags under any partitioning of the input — i.e. the
  * aggregator is a commutative monoid action, so map-side partials
  * compose to the same sketch the old global sort produced.
  */
class KMinHashesSpec extends AnyFunSuite {
  private val agg = new KMinHashes(3)
  private def e(h: String, a: Int = 0, b: Int = 0) = KmvEntry(h, a, b)
  private def reduceAll(xs: Seq[KmvEntry]) = xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps the k smallest, ascending, capped") {
    val r = reduceAll(Seq(e("d"), e("a"), e("c"), e("b"), e("e")))
    assert(agg.finish(r).map(_.hu) == Seq("a", "b", "c"))
  }

  test("duplicates merge flags instead of occupying slots") {
    val r = reduceAll(Seq(e("a", 1, 0), e("b"), e("a", 0, 1), e("c"), e("d")))
    assert(agg.finish(r) == Seq(e("a", 1, 1), e("b"), e("c")))
  }

  test("a duplicate of the k-th minimum merges even when the buffer is full") {
    val r = reduceAll(Seq(e("a"), e("b"), e("c", 1, 0), e("c", 0, 1)))
    assert(agg.finish(r) == Seq(e("a"), e("b"), e("c", 1, 1)))
  }

  test("merge of partition partials equals single-pass reduce (any split)") {
    val xs = Seq("f", "a", "d", "a", "b", "e", "c", "b").zipWithIndex
      .map { case (h, i) => e(h, i % 2, (i + 1) % 2) }
    val whole = agg.finish(reduceAll(xs))
    (0 to xs.length).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      assert(agg.finish(agg.merge(reduceAll(l), reduceAll(r))) == whole,
        s"split at $cut diverges")
    }
  }

  test("sub-k input emits all distinct values (the exact-count branch)") {
    val r = reduceAll(Seq(e("b"), e("a"), e("b")))
    assert(agg.finish(r).map(_.hu) == Seq("a", "b"))
  }
}
