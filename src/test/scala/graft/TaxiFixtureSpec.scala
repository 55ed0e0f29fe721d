package graft

import graft.model.{TaxiFixture, TaxiRide}
import graft.geo.NycGeo
import graft.streaming._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference-faithful CSV fixture end-to-end (FIXTURES.md §A):
  * parse through the codec, run the early-trigger pipeline, and
  * observe actual early fires — the fixture's clustered drop-offs
  * must push some (cell, window) past the 50-passenger threshold.
  */
class TaxiFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def parsed = {
    import spark.implicits._
    TaxiRide.parseCsv(TaxiFixture.csvLines(600).toDF("line"), "line")
  }

  test("fixture satisfies its FIXTURES.md contract") {
    val df = parsed.cache()
    val span = df.agg((unix_millis(max(col("time"))) -
      unix_millis(min(col("time")))).as("span")).head().getLong(0)
    assert(span >= 45 * 60 * 1000L) // ≥ 45 min of event time
    val outside = df.filter(!NycGeo.isInNYC(col("lon"), col("lat"))).count()
    assert(outside > 0) // bbox filter is exercised
    // clustered drop-offs: some (cell, 15-min window) exceeds 50 passengers
    val hot = df.filter(!col("isStart"))
      .filter(NycGeo.isInNYC(col("lon"), col("lat")))
      .groupBy(window(col("time"), "15 minutes", "5 minutes"),
        NycGeo.gridCell(col("lon"), col("lat")).as("cell"))
      .agg(sum(col("passengerCnt")).as("p"))
      .filter(col("p") >= 50)
      .count()
    assert(hot > 0)
    df.unpersist()
  }

  test("early trigger actually fires early on the fixture") {
    // drive the trigger state machine directly per cell in time order
    val byCell = parsed
      .filter(!col("isStart") && NycGeo.isInNYC(col("lon"), col("lat")))
      .select(NycGeo.gridCell(col("lon"), col("lat")).as("cell"),
        col("rideId"), unix_millis(col("time")).as("tMs"),
        col("passengerCnt").cast("int").as("passengers"))
      .collect()
      .map(r => CellEvent(r.getInt(0), r.getLong(1),
        new java.sql.Timestamp(r.getLong(2)), r.getInt(3)))
      .groupBy(_.cell)
    val earlies = byCell.toSeq.flatMap { case (cell, evs) =>
      val state = org.apache.spark.sql.streaming.TestGroupState.create[Map[Long, (Long, Long)]](
        optionalState = org.apache.spark.api.java.Optional.empty[Map[Long, (Long, Long)]](),
        timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
        batchProcessingTimeMs = 0L,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)),
        hasTimedOut = false)
      evs.sortBy(_.tMs).flatMap(e =>
        TaxiPipelines.earlyTriggerFn(50)(cell, Iterator(e), state).toList)
    }
    // the 50-passenger threshold is crossed mid-window → early fires
    assert(earlies.nonEmpty)
    assert(earlies.forall(!_.isFinal))
    assert(earlies.forall(_.cnt >= 50))
  }
}
