package graft

import graft.streaming._
import org.scalatest.funsuite.AnyFunSuite

/** `replayPaced` — the live-demo pacing path (reference `toServingTime`,
  * `sources/TaxiRideSource.scala:265-268`, 600× in the demos): the
  * schedule must bin events by compressed serving time, preserve every
  * event exactly once, and feed batches through the MemoryStream at
  * wall pace.
  */
class ReplayPacedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pacedBatches bins by toServingTime, loses nothing, sorts within batch") {
    val rides = TaxiReplay.ridesFromEvents(spark, sf).collect().toSeq
    val serving = TaxiReplay.servingOrder(rides, 60000L)
    val speed = 600.0
    val batchMs = 1000L
    val batches = TaxiReplay.pacedBatches(serving, speed, batchMs)

    // every event exactly once
    assert(batches.flatten.map(_.rideId).sorted == serving.map(_.rideId).sorted)
    assert(batches.size > 1, "span must exceed one serving interval at 600x")

    // each batch = one toServingTime wall interval, intervals ascending
    val t0 = serving.head.tMs
    val perBatch = (batchMs * speed).toLong // event-time ms per wall batch
    val buckets = batches.map { b =>
      val bs = b.map(e => (e.tMs - t0) / perBatch).distinct
      assert(bs.size == 1, s"batch spans serving intervals $bs")
      bs.head
    }
    assert(buckets == buckets.sorted, "batches out of serving order")
    assert(buckets.distinct.size == buckets.size, "duplicate serving interval")

    // within a batch events feed in (tMs, rideId) order
    batches.foreach { b =>
      val key = b.map(e => (e.tMs, e.rideId))
      assert(key == key.sorted)
    }
  }

  test("pacedSchedule keys batches by serving interval — a data lull keeps its gap") {
    // events in intervals 0 and 7 (with perBatch = 1000*1.0 = 1000 ms
    // of event time per wall batch): the schedule must carry the
    // interval indices so deadline-based feeding holds 6 intervals of
    // wall silence instead of compressing the lull away
    val evs = Seq(
      RideEvent(1L, 100L, isStart = false, -74.0, 40.75, 1),
      RideEvent(2L, 7300L, isStart = false, -74.0, 40.75, 1),
      RideEvent(3L, 7400L, isStart = false, -74.0, 40.75, 1))
    val sched = TaxiReplay.pacedSchedule(evs, speedFactor = 1.0, batchMs = 1000L)
    assert(sched.map(_._1) == Seq(0L, 7L))
    assert(sched.map(_._2.size) == Seq(1, 2))
  }

  test("replayPaced feeds all events at wall pace") {
    import spark.implicits._
    val rides = TaxiReplay.ridesFromEvents(spark, sf).collect().toSeq.take(200)
    val serving = TaxiReplay.servingOrder(rides, 0L)
    // high speed + tiny batchMs: a fast test that still spans >1 batch
    val speed = 60000.0
    val batchMs = 5L
    val nBatches = TaxiReplay.pacedBatches(serving, speed, batchMs).size
    assert(nBatches > 1)

    val (ms, df) = TaxiReplay.memoryStream(spark)
    val ckpt = TempDir.create("graft-paced-")
    val q = df.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName("paced_out")
      .start()
    val t0 = System.nanoTime()
    try {
      TaxiReplay.replayPaced(ms, serving, speed, batchMs)
      q.processAllAvailable()
    } finally {
      q.stop()
      TempDir.deleteRecursively(ckpt.toString)
    }
    val wallMs = (System.nanoTime() - t0) / 1000000
    assert(spark.table("paced_out").count() == serving.size.toLong)
    // one sleep per batch: the feed cannot complete faster than the pace
    assert(wallMs >= nBatches * batchMs, s"paced feed took ${wallMs}ms for $nBatches batches")
  }
}
