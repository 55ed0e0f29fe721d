package graft

import graft.functions.{MisraGries, MisraGriesAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Misra–Gries heavy-hitters: exactness on the (≤ k distinct) corpus
  * through the real Dataset typed-aggregation path, and the classic
  * guarantees on skewed synthetic streams under arbitrary
  * partitionings (the merge path a 1000-executor fleet exercises).
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("corpus sketch at k=64 is exact (vocab 31 ≤ k) across partitions") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("t"))
      .as[String].repartition(7)
    val sketch = toks.select(new MisraGriesAgg(64).toColumn).head()
    val exact = toks.groupBy(col("t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.toMap == exact)
    // finish order is (count desc, token asc)
    assert(sketch == sketch.sortBy { case (t, c) => (-c, t) })
  }

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 400)
    // zipfian-ish: small ids common, occasional heavy hitter runs
    s <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.const("hh")), (3, Gen.oneOf("a", "b", "c")),
      (2, Gen.chooseNum(0, 40).map("t" + _))))
  } yield s

  test("every token with freq > N/(k+1) survives, error bounded, any partitioning") {
    check(forAll(streamGen, Gen.chooseNum(2, 8), Gen.chooseNum(1, 5)) {
      (s: List[String], k: Int, parts: Int) =>
        val chunks = s.grouped(math.max(1, s.length / parts)).toList
        val summaries = chunks.map(_.foldLeft(Map.empty[String, Long])(
          (m, t) => MisraGries.insert(m, t, k)))
        val merged = summaries.foldLeft(Map.empty[String, Long])(
          (a, b) => MisraGries.merge(a, b, k))
        val exact = s.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
        val bound = s.length.toDouble / (k + 1)
        val sizeOk = merged.size <= k
        val hhKept = exact.forall { case (t, c) =>
          c <= bound || merged.contains(t)
        }
        val errOk = merged.forall { case (t, est) =>
          val c = exact.getOrElse(t, 0L)
          est <= c && c - est <= bound + 1e-9
        }
        sizeOk && hhKept && errOk
    })
  }
}
