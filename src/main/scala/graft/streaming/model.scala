package graft.streaming

/** Typed event model for the streaming pipelines. `tMs` is event time
  * in epoch millis — the engine's canonical event-time unit
  * (reference: Flink event timestamps, `sources/TaxiRideSource.scala:116`).
  */
final case class RideEvent(
    rideId: Long,
    tMs: Long,
    isStart: Boolean,
    lon: Double,
    lat: Double,
    passengers: Int)

/** Post-filter, post-projection event: the reference's narrowed
  * `(cellId, time, passengerCnt)` tuple stream
  * (`examples/TotalArrivalCount.scala:70-73`). Keeps the watermarked
  * `ts` column — required for event-time timeouts downstream.
  */
final case class CellEvent(cell: Int, ts: java.sql.Timestamp, passengers: Int) {
  def tMs: Long = ts.getTime
}

/** Output of the windowed pipelines: count for one (cell, window) pane.
  * `isFinal` distinguishes the early-trigger's partial fires (Flink
  * `TriggerResult.FIRE`) from the watermark-driven final fire
  * (`FIRE_AND_PURGE`, `examples/EarlyArrivalCount.scala:144-151`).
  */
final case class WindowCount(cell: Int, wEndMs: Long, cnt: Long, isFinal: Boolean)
