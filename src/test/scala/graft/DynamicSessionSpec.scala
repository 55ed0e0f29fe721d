package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent net under `events_sessionize_dynamic`'s semantics: on
  * RANDOM event sets, Spark's expression-valued `session_window` must
  * equal a 10-line reference interval-merge (sort by time; a session
  * breaks only where an event's start STRICTLY exceeds the running
  * max end of [t, t+gap(e)] — the boundary is INCLUSIVE: an event at
  * exactly session-end + gap still merges, probed empirically below).
  * This spec is the net that caught the original `>=` oracle
  * spelling: the fixtures never land on an exact boundary, so only a
  * reference implementation sharing nothing with either engine pins
  * the convention.
  */
class DynamicSessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val GapA = 60000L // etype 'a' holds the session open 60 s
  private val GapB = 120000L // etype 'b' holds it open 120 s
  private def gapOf(e: String): Long = if (e == "b") GapB else GapA

  /** Reference interval-merge over one user's (t, etype) events. */
  private def mergeRef(evs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val sorted = evs.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((t, e) <- sorted) {
      val end = t + gapOf(e)
      if (out.nonEmpty && t <= out.last._2)
        out(out.size - 1) = (out.last._1, math.max(out.last._2, end), out.last._3 + 1)
      else out += ((t, end, 1L))
    }
    out.toSeq
  }

  test("session_window(dynamic gap) equals the reference interval-merge (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val genEvent = for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 600000L)
      e <- Gen.oneOf("a", "b")
    } yield (u, t, e)
    val prop = Prop.forAll(Gen.listOfN(60, genEvent)) { evs =>
      val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
        mergeRef(es.map(x => (x._2, x._3))).map { case (s, e, n) => (u, s, e, n) }
      }.toSet
      val got = evs.toDF("user_id", "t_ms", "etype")
        .groupBy(col("user_id"), session_window(timestamp_millis(col("t_ms")),
          when(col("etype") === "b", "120 seconds")
            .otherwise("60 seconds")).as("sw"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), unix_millis(col("sw.start")),
          unix_millis(col("sw.end")), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("an event starting exactly at the running end MERGES (inclusive boundary)") {
    import spark.implicits._
    // t=0 'a' holds until 60000; t=60000 merges (Spark's boundary is
    // inclusive) — the convention both oracles' strict-> break mirrors
    val got = Seq((1L, 0L, "a"), (1L, 60000L, "a"))
      .toDF("user_id", "t_ms", "etype")
      .groupBy(col("user_id"), session_window(timestamp_millis(col("t_ms")),
        when(col("etype") === "b", "120 seconds").otherwise("60 seconds")).as("sw"))
      .agg(count(lit(1)).as("n"))
      .count()
    assert(got == 1, "t == end did not merge — the inclusive-boundary contract is broken")
  }
}
