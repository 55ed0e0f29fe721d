package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-10 curation/analytics additions, asserted
  * structurally (the value-level check is the DuckDB oracle):
  * the global shuffle is a permutation, cluster representatives are
  * the longest member of their own component, and funnel stages are
  * strictly ordered inside the conversion window.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("text_global_shuffle emits a permutation of 1..N") {
    val n = Tables.documents(spark, sf).count()
    val pos = SparkEntry.queries("text_global_shuffle")(spark, sf)
      .select(col("pos")).collect().map(_.getLong(0))
    assert(pos.length == n)
    assert(pos.toSet == (1L to n).toSet)
  }

  test("dedup_representatives picks the longest member of each multi-member component") {
    import graft.queries.DedupQueries
    val pairs = DedupQueries.minhashVerifiedPairs(spark, sf)
    val docs = Tables.documents(spark, sf)
    val labels = DedupQueries.connectedComponents(
      spark, pairs.select(col("doc_a"), col("doc_b")), docs.select(col("doc_id")))
    val byComp = labels.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .collect()
      .groupBy(_.getAs[Long]("component"))
    val reps = SparkEntry.queries("dedup_representatives")(spark, sf).collect()
    assert(reps.nonEmpty, "fixture should contain at least one near-dup cluster")
    reps.foreach { r =>
      val comp = r.getAs[Long]("component")
      val members = byComp(comp)
      assert(r.getAs[Long]("n_members") == members.length)
      assert(members.length > 1)
      // representative = max n_chars, doc_id tiebreak — and is a member
      val want = members.map(m =>
        (m.getAs[Long]("n_chars"), -m.getAs[Long]("doc_id"))).max
      assert(r.getAs[Long]("rep_id") == -want._2)
      assert(r.getAs[Long]("rep_chars") == want._1)
    }
    // every multi-member component is reported
    assert(reps.length == byComp.count(_._2.length > 1))
  }

  test("events_funnel stages are ordered and inside the 24h window") {
    import graft.queries.EventQueries.FunnelWindowMs
    val rows = SparkEntry.queries("events_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val reached = r.getAs[Int]("reached")
      val t1 = r.getAs[Long]("t1_ms")
      val t2 = Option(r.getAs[java.lang.Long]("t2_ms")).map(_.longValue)
      val t3 = Option(r.getAs[java.lang.Long]("t3_ms")).map(_.longValue)
      assert(reached == 1 + t2.size + t3.size)
      assert(t3.isEmpty || t2.nonEmpty, "stage 3 requires stage 2")
      t2.foreach(t => assert(t > t1 && t <= t1 + FunnelWindowMs))
      (t2, t3) match {
        case (Some(a), Some(b)) => assert(b > a && b <= a + FunnelWindowMs)
        case _ =>
      }
    }
  }
}
