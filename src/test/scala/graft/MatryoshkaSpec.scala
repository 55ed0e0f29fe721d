package graft

import org.scalatest.funsuite.AnyFunSuite

/** The matryoshka two-stage contract (same structure as
  * [[Int8RerankSpec]]): full-dim exact re-ranking of the prefix-dim
  * shortlist can only help — every true top-K neighbor that makes the
  * 3K shortlist sorts into the re-ranked top-K, while the single-stage
  * output is the shortlist's truncated-cosine head. So recall@K vs
  * `knn_brute` must satisfy rerank ≥ truncated, structurally. The
  * fixture embeddings are not MRL-trained (no information is
  * front-loaded into the prefix), so the SINGLE-stage recall here is
  * the truncation lever's worst case — the spec pins the shape of the
  * trade, not a trained model's numbers.
  */
class MatryoshkaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("full-dim re-rank recall is at least the truncated-dim recall") {
    val brute = pairs("knn_brute")
    val mat = pairs("knn_matryoshka")
    val rerank = pairs("knn_matryoshka_rerank")
    val matRecall = (brute & mat).size.toDouble / brute.size
    val rerankRecall = (brute & rerank).size.toDouble / brute.size
    assert(rerankRecall >= matRecall,
      s"rerank recall $rerankRecall < truncated recall $matRecall")
    // the shortlist is 3K deep, so re-rank recovers a real margin over
    // the raw truncated head even on untrained embeddings
    assert(rerankRecall > matRecall || rerankRecall == 1.0,
      s"re-rank bought nothing: both at $rerankRecall")
    info(s"recall@10: truncated=$matRecall, rerank=$rerankRecall")
  }
}
