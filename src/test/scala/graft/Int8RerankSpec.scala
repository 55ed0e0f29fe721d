package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contract of two-stage retrieval: exact-cosine re-ranking of the
  * int8 shortlist can only help. Every true top-K neighbor that makes
  * the 3K shortlist ranks inside the re-ranked top-K (true top-K items
  * have the highest exact cosines, so within any shortlist they sort
  * first), while the single-stage `knn_int8` output is the shortlist's
  * est-ordered head — so recall@K vs `knn_brute` must satisfy
  * rerank ≥ int8, structurally, not just empirically.
  */
class Int8RerankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact re-rank recall is at least the single-stage int8 recall") {
    val brute = pairs("knn_brute")
    val int8 = pairs("knn_int8")
    val rerank = pairs("knn_int8_rerank")
    val int8Recall = (brute & int8).size.toDouble / brute.size
    val rerankRecall = (brute & rerank).size.toDouble / brute.size
    assert(rerankRecall >= int8Recall,
      s"rerank recall $rerankRecall < int8 recall $int8Recall")
    assert(rerankRecall > 0.9,
      s"rerank recall $rerankRecall — a 3K shortlist on 64-dim int8 should be near-exact")
  }
}
