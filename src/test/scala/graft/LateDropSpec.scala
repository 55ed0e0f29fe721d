package graft

import graft.queries.StreamingQueries
import graft.streaming._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two halves of the watermark contract on the SAME injected feed
  * (SURVEY.md §5.4). `taxi_late_drop` driver-checks the drop half at
  * sf0.01; this spec pins BOTH halves at sf0.001 so the entry cannot
  * pass vacuously:
  *
  *  - under the 60 s bound, events re-delivered hours past their panes
  *    are dropped → streaming counts equal the batch counts WITHOUT
  *    the re-deliveries;
  *  - under a watermark delay larger than the fixture's time range the
  *    same re-deliveries are admitted → streaming counts equal the
  *    batch counts WITH them (strictly different from the first).
  */
class LateDropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private type Counts = Map[(Int, Long), Long]

  private def batchCounts(evs: Seq[RideEvent]): Counts = {
    import spark.implicits._
    val df = evs.toDF().withColumn("ts", timestamp_millis(col("tMs")))
    TaxiPipelines.slidingAgg(TaxiPipelines.cellProject(df))
      .filter(col("cnt") > 0)
      .select(col("cell"), col("w_end_ms"), col("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def streamCounts(fed: Seq[RideEvent], delayMs: Long): Counts = {
    val (ms, df) = TaxiReplay.memoryStream(spark)
    val name = s"latedrop_${delayMs}"
    val ckpt = TempDir.create("graft-late-")
    val q = TaxiPipelines.slidingArrivalCount(df, s"$delayMs milliseconds")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName(name).start()
    try {
      TaxiReplay.feedInBatches(ms, fed, 4, () => q.processAllAvailable())
      q.processAllAvailable() // no-data batch applies the final watermark
    } finally {
      q.stop()
      TempDir.deleteRecursively(ckpt.toString)
    }
    spark.table(name).filter(col("cnt") > 0)
      .select(col("cell"), col("w_end_ms"), col("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("late re-deliveries are dropped at 60 s but admitted under a large delay") {
    val rides = TaxiReplay.ridesFromEvents(spark, sf).collect().toSeq
    val ordered = TaxiReplay.servingOrder(rides, 60000L)
    val late = StreamingQueries.lateArrivals(ordered)
    assert(late.size == StreamingQueries.LateDropN)
    val maxT = ordered.map(_.tMs).max
    // the injection is genuinely late: hours older than the final watermark
    assert(late.forall(_.tMs < maxT - 3600000L))

    // drop half: sentinel 2 h past the end flushes every pane at 60 s delay
    val droppedFeed = (ordered ++ late) :+ TaxiReplay.sentinelAfter(ordered)
    val dropped = streamCounts(droppedFeed, 60000L)
    assert(dropped == batchCounts(ordered))

    // admit half: delay covers the whole fixture range, so nothing is
    // ever late; the sentinel must sit past maxT + delay to flush
    val admitDelay = (maxT - ordered.map(_.tMs).min) + 3600000L
    val admitSentinel = RideEvent(-1L, maxT + admitDelay + 7200000L,
      isStart = false, -74.0, 40.75, 0)
    val admitted = streamCounts((ordered ++ late) :+ admitSentinel, admitDelay)
    assert(admitted == batchCounts(ordered ++ late))
    assert(admitted != dropped) // the injection visibly counts when admitted
  }
}
