package graft

import graft.queries.DedupQueries
import org.scalatest.funsuite.AnyFunSuite

/** The min-label-propagation superstep loop on graphs whose shape the
  * sf oracles don't exercise: long chains (worst-case diameter),
  * multiple components, and singletons.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    val labels = DedupQueries.connectedComponents(
      spark, edges.toDF("a", "b"), nodes.toDF("doc_id"))
    labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph collapses to its minimum id; singletons stay themselves") {
    // 10→11→…→19 is a diameter-9 chain — the slowest shape for plain
    // min propagation; 30—31 a pair; 40 isolated.
    val chain = (10L until 19L).map(i => (i, i + 1))
    val got = run(chain :+ (30L, 31L), (10L to 19L) ++ Seq(30L, 31L, 40L))
    val want = (10L to 19L).map(_ -> 10L).toMap ++
      Map(30L -> 30L, 31L -> 30L, 40L -> 40L)
    assert(got == want)
  }

  test("empty edge set is a fixpoint after one superstep") {
    val got = run(Seq.empty, Seq(1L, 2L, 3L))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("edge direction does not matter (symmetrized internally)") {
    // all edges written max→min; min must still win
    val got = run(Seq((5L, 2L), (9L, 5L), (7L, 9L)), Seq(2L, 5L, 7L, 9L))
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 2L, 9L -> 2L))
  }
}
