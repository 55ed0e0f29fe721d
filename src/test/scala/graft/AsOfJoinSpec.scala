package graft

import graft.plans.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom AsOfJoin operator vs the composable built-in
  * formulation (theta-join + window rank): identical results, without
  * materializing the (left × right-history) pair blow-up.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sides = {
    val ev = Tables.events(spark, sf)
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t_ms"))
    val right = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("r_user"), unix_millis(col("ts")).as("r_t_ms"))
      .agg(max(col("value")).as("r_value"))
    (left, right)
  }

  test("matches the theta-join + window-rank formulation") {
    val (left, right) = sides
    val custom = AsOf.join(left, right, "user_id", "r_user", "t_ms", "r_t_ms")
      .select(col("event_id"), col("r_t_ms"), col("r_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("r_t_ms").desc)
    val composed = left.join(right,
        col("user_id") === col("r_user") && col("r_t_ms") <= col("t_ms"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("r_t_ms"), col("r_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(custom.nonEmpty)
    assert(custom == composed)
  }

  test("plans as one exchange + sort per side, no pair materialization") {
    val (left, right) = sides
    val plan = AsOf.join(left, right, "user_id", "r_user", "t_ms", "r_t_ms")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // exec nodeName strips the Exec suffix
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("string keys survive projection-buffer reuse") {
    import spark.implicits._
    // regression: candidateKey must be a COPY — UTF8String keys read
    // from the reused projection buffer mutate on the next right row
    val l = Seq(("a", 100L, 1), ("b", 5L, 2)).toDF("k", "t", "id")
    val r = Seq(("a", 50L, 1.0), ("b", 60L, 2.0)).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("id", "rt").collect().map(x => (x.getInt(0), x.getLong(1))).toSet
    // (a,100) matches (a,50); (b,5) has no right row at/before t=5
    assert(got == Set((1, 50L)))
  }

  test("null keys and times never match and never crash") {
    import spark.implicits._
    val l = Seq((null.asInstanceOf[String], 10L, 1), ("a", 100L, 2)).toDF("k", "t", "id")
    val r = Seq((null.asInstanceOf[String], 5L, 9.0), ("a", 50L, 1.0)).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("id", "v").collect().map(x => (x.getInt(0), x.getDouble(1))).toSet
    assert(got == Set((2, 1.0)))
  }

  test("self-join over the same relation re-aliases shared exprIds") {
    import spark.implicits._
    val d = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val rows = AsOf.join(d, d, "k", "k", "t", "t").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    // each left row matches itself (latest right with rt <= t)
    assert(rows == Set((10L, 10L), (20L, 20L)))
  }

  test("mismatched key types fail fast with a clear message") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1, 5L, 1.0)).toDF("rk", "rt", "v") // Int key vs Long
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("key types differ"))
  }

  test("left rows with no prior right row drop out (inner as-of)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 20L, 5L), (2L, 30L, 50L))
      .toDF("k", "id", "t")
    val r = Seq((1L, 50L, 1.0), (3L, 1L, 9.9)).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("id", "rt", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    // only left id=10 (k=1, t=100 ≥ rt=50) matches; t=5 is before the
    // first right row; k=2 has no right rows at all
    assert(got == Set((10L, 50L, 1.0)))
  }

  test("random inputs with heavy ties: one row per matched left, deterministic time (ScalaCheck)") {
    // The AsOf contract under right-side (key, time) duplicates: the
    // matched TIME is the max right time ≤ t and exactly one output
    // row per matched left row — even when several right rows tie on
    // that time (whose payload wins is deliberately unspecified; see
    // AsOf's scaladoc). Tiny value domains force collisions a fixture
    // never produces.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genLeft = for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 20L)
    } yield (k, t)
    val genRight = for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 20L); v <- Gen.choose(0, 9)
    } yield (k, t, v)
    val prop = Prop.forAll(
      Gen.listOfN(25, genLeft), Gen.listOfN(25, genRight)) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "id")
      val r = rs.toDF("rk", "rt", "v")
      val got = AsOf.join(l, r, "k", "rk", "t", "rt")
        .select("id", "k", "t", "rt")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      val expected = ls.zipWithIndex.flatMap { case ((k, t), i) =>
        val times = rs.collect { case (rk, rt, _) if rk == k && rt <= t => rt }
        if (times.isEmpty) None else Some((i.toLong, k, t, times.max))
      }.toSet
      got.map(_._1).distinct.length == got.length && // one row per left
        got.toSet == expected // matched time = max right time ≤ t
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
