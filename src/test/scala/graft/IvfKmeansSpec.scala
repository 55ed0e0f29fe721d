package graft

import org.scalatest.funsuite.AnyFunSuite

/** The point of learning IVF centroids: cells that fit the data
  * distribution must retrieve at least as well as the deterministic
  * lattice stand-in they replace. Recall@K is measured against the
  * exact `knn_brute` baseline on the same fixture, comparing the
  * lattice (`knn_ivf`) and learned (`knn_ivf_kmeans`) variants at the
  * same nprobe=2 budget.
  */
class IvfKmeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("learned cells retrieve at least as well as the lattice") {
    val brute = pairs("knn_brute")
    val lattice = pairs("knn_ivf")
    val learned = pairs("knn_ivf_kmeans")
    val latticeRecall = (brute & lattice).size.toDouble / brute.size
    val learnedRecall = (brute & learned).size.toDouble / brute.size
    assert(learnedRecall >= latticeRecall,
      s"learned recall $learnedRecall < lattice recall $latticeRecall")
    // and the learned cells must actually retrieve something nontrivial
    assert(learnedRecall > 0.2, s"learned recall $learnedRecall is degenerate")
  }

  test("training is deterministic and keeps a usable cell count") {
    val c1 = SparkEntry.queries("ivf_kmeans_centroids")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).sorted.toSeq
    val c2 = SparkEntry.queries("ivf_kmeans_centroids")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))).sorted.toSeq
    assert(c1 == c2, "two training runs diverged — k-means is not deterministic")
    val cells = c1.map(_._1).distinct
    assert(cells.size >= 2 && cells.size <= 8, s"unexpected cell count: $cells")
  }
}
