package graft

import graft.functions.{Scored, TopKByScore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct net under the bounded top-k aggregator every retrieval
  * entry's shuffle rides on: its (cos DESC, vec_id ASC) contract —
  * the ROW_NUMBER ordering every knn oracle mirrors — must hold under
  * HEAVY score ties and arbitrary partition splits (the partial/merge
  * path the fixtures exercise only with near-unique doubles), and NaN
  * scores must be EXCLUDED, not sorted.
  */
class TopKByScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val K = 4

  private def run(rows: Seq[(Long, Long, Double)], parts: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    rows.toDS().repartition(parts)
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(new TopKByScore(K).toColumn)
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.vec_id"), (col("pos") + 1).cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("heavy ties + random partitioning: equals the sort-based reference (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // a 4-value score domain forces ties at and across the k boundary
    val genRow = for {
      q <- Gen.choose(1L, 2L)
      s <- Gen.oneOf(0.1, 0.2, 0.3, 0.4)
    } yield (q, s)
    val prop = Prop.forAll(Gen.listOfN(30, genRow), Gen.choose(1, 6)) { (rs, parts) =>
      // vec_ids unique per query, as in every production call site
      val rows = rs.zipWithIndex.map { case ((q, s), i) => (q, i.toLong, s) }
      val expected = rows.groupBy(_._1).flatMap { case (q, grp) =>
        grp.sortBy(r => (-r._3, r._2)).take(K).zipWithIndex
          .map { case (r, i) => (q, r._2, i + 1) }
      }.toSet
      run(rows, parts) == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("NaN scores are excluded, never ranked") {
    val rows = Seq(
      (1L, 10L, 0.5), (1L, 11L, Double.NaN), (1L, 12L, 0.3),
      (1L, 13L, Double.NaN), (1L, 14L, 0.1))
    val got = run(rows, 2)
    assert(got == Set((1L, 10L, 1), (1L, 12L, 2), (1L, 14L, 3)),
      s"NaN leaked into the ranking: $got")
  }
}
