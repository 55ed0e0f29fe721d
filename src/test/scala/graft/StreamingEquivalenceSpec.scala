package graft

import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** Out-of-order invariance (SURVEY.md §5.4): replaying the same events
  * through the streaming pipelines with the reference's bounded-
  * Gaussian serving delay (seed 7452) yields results identical to the
  * ordered replay — the event-time guarantee the reference README
  * stakes out (`README.md:64-65`). The batch-vs-stream equivalence is
  * driver-checked via the shared DuckDB oracles in StreamingQueries.
  */
class StreamingEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bounded gaussian delay stays in [0, max] and is deterministic") {
    val r1 = new scala.util.Random(7452)
    val r2 = new scala.util.Random(7452)
    val d1 = Seq.fill(1000)(TaxiReplay.boundedGaussianDelay(r1, 60000L))
    val d2 = Seq.fill(1000)(TaxiReplay.boundedGaussianDelay(r2, 60000L))
    assert(d1 == d2)
    assert(d1.forall(d => d >= 0 && d <= 60000L))
    assert(d1.distinct.size > 100) // actually random, not constant
  }

  test("serving order with delay is a bounded permutation of event order") {
    val rides = TaxiReplay.ridesFromEvents(spark, sf).collect().toSeq
    val ordered = TaxiReplay.servingOrder(rides, 0L)
    val delayed = TaxiReplay.servingOrder(rides, 60000L)
    assert(ordered.map(_.rideId).sorted == delayed.map(_.rideId).sorted)
    assert(ordered.map(_.rideId) != delayed.map(_.rideId)) // actually shuffled
    // no event serves more than maxDelay before/after its slot
    val pos = ordered.map(_.rideId).zipWithIndex.toMap
    val tOf = rides.map(r => r.rideId -> r.tMs).toMap
    delayed.sliding(2).foreach { case Seq(a, b) =>
      assert(tOf(a.rideId) <= tOf(b.rideId) + 60000L)
    }
  }

  test("ordered and out-of-order replay converge to identical sliding counts") {
    import org.apache.spark.sql.functions._
    def run(delayMs: Long): Map[(Int, Long), Long] = {
      val rides = TaxiReplay.ridesFromEvents(spark, sf).collect().toSeq
      val maxT = rides.map(_.tMs).max
      val fed = TaxiReplay.servingOrder(rides, delayMs) :+
        RideEvent(-1L, maxT + 7200000L, isStart = false, -74.0, 40.75, 0)
      val (ms, df) = TaxiReplay.memoryStream(spark)
      val name = s"equiv_$delayMs"
      val ckpt = TempDir.create("graft-eq-")
      val q = TaxiPipelines.slidingArrivalCount(df)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .format("memory").queryName(name).start()
      try {
        TaxiReplay.feedInBatches(ms, fed, 6, () => q.processAllAvailable())
        q.processAllAvailable()
      } finally {
        q.stop()
        TempDir.deleteRecursively(ckpt.toString)
      }
      spark.table(name).filter(col("cnt") > 0)
        .select(col("cell"), col("w_end_ms"), col("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val ordered = run(0L)
    val unordered = run(60000L)
    assert(ordered.nonEmpty)
    assert(ordered == unordered)
  }
}
