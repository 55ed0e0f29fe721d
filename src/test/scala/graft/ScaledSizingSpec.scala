package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-tracking sizing functions behind the `*_scaled` entries
  * (SCALE.md second decade). These are the load-bearing scale knobs —
  * an off-by-one at a power-of-two boundary would silently mis-size
  * every bucket/cell at exactly the corpus sizes where the answer
  * changes — and they must be EXACT integer arithmetic so the SQL
  * mirrors (computed from COUNT(*) in a CTE) agree bit-for-bit; these
  * properties pin the contracts the oracles assume. Pure functions,
  * no Spark session.
  */
class ScaledSizingSpec extends AnyFunSuite {

  import graft.queries.{DedupQueries, SimilarityQueries}

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val ns: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, 10000L),
    Gen.chooseNum(0L, 1000000000L),
    // the boundary lattice: 2^b·250 ± 1 for every b in range
    Gen.chooseNum(4, 20).flatMap(b =>
      Gen.oneOf((1L << b) * 250 - 1, (1L << b) * 250, (1L << b) * 250 + 1)))

  test("embBandBits: smallest width whose mean occupancy is within target") {
    check(forAll(ns) { n =>
      val b = DedupQueries.embBandBits(n)
      (b >= 4 && b <= 20) &&
        // sufficiency: 2^b buckets hold n at ≤250 mean (unless capped)
        (b == 20 || (1L << b) * 250L >= n) &&
        // minimality: one bit fewer overflows the target (unless floored)
        (b == 4 || (1L << (b - 1)) * 250L < n)
    })
  }

  test("embBandBits is monotone in the corpus size") {
    check(forAll(ns, ns) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      DedupQueries.embBandBits(lo) <= DedupQueries.embBandBits(hi)
    })
  }

  test("scaledK: clamp(n/2500, 8, 2048), exact at the boundaries") {
    assert(SimilarityQueries.scaledK(0L) == 8)
    assert(SimilarityQueries.scaledK(2500L * 8) == 8)
    assert(SimilarityQueries.scaledK(2500L * 9) == 9)
    assert(SimilarityQueries.scaledK(2500L * 2048) == 2048)
    assert(SimilarityQueries.scaledK(Long.MaxValue / 4) == 2048)
    check(forAll(ns) { n =>
      val k = SimilarityQueries.scaledK(n)
      (k >= 8 && k <= 2048) &&
        // inside the clamp window each cell holds ~CellTarget vectors
        // (floor-division slack only)
        (k == 8 || k == 2048 || (n / k >= 2500 - 2500 / k && n / k < 2500 * 2))
    })
  }

  test("trainStride keeps the training sample within the per-cell budget") {
    check(forAll(ns) { n =>
      val k = SimilarityQueries.scaledK(n)
      val m = SimilarityQueries.trainStride(n, k)
      // sample size n/m stays within ~2× of the 100·k budget when the
      // stride engages; a stride of 1 means the whole corpus is at or
      // under budget scale already
      m >= 1 && (if (m > 1) n / m >= 100L * k && n / m <= 2L * 100L * k + k
                 else n <= 2L * 100L * k + k)
    })
  }
}
