package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-pane trigger counters: total passenger sum and the sum since
  * the last early fire (the reference trigger's per-pane
  * `ReducingState` count, `examples/EarlyArrivalCount.scala:117-160`).
  */
final case class PaneCounters(sum: Long, sinceFire: Long)

/** O11's early-firing count trigger on the NEW arbitrary-state API
  * (`transformWithState`) — the pane state machine of
  * [[TaxiPipelines.earlyTriggerFn]] re-expressed on the primitives
  * Spark is consolidating stateful streaming on, and the hardest
  * state shape in the TWS matrix: a keyed MAP of live panes
  * (windowEnd → counters) point-updated per event, plus event-time
  * timers driving the watermark-final fire-and-purge.
  *
  * Why MapState and not a ValueState[Map]: a pane update touches ONE
  * pane of the (windowSize/slide) live ones; MapState's point-write
  * updates that cell in place, where a ValueState would rewrite the
  * whole map per event (the same argument as [[TypeCountProcessor]],
  * here on the write-heavy trigger path).
  *
  * Semantics are IDENTICAL to the fMGWS form — same (tMs, rideId)
  * batch determinization, same FIRE (emit current sum, keep
  * contents, reset since-fire) / FIRE_AND_PURGE (watermark passes the
  * pane end) split, same late-pane drop — so the complete early-fire
  * sequence under ordered replay is pinned by the same recursive-CTE
  * oracle as `taxi_early_fires` (TaxiQueries.earlyFiresSql).
  *
  * State per key is bounded by the live-pane count exactly as in the
  * fMGWS form; exactly one live timer per key, re-armed at the
  * earliest live pane end after every batch/expiry.
  */
class EarlyTriggerProcessor(threshold: Int)
    extends StatefulProcessor[Int, CellEvent, WindowCount] {
  @transient private var panes: MapState[Long, PaneCounters] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    panes = getHandle.getMapState("panes", Encoders.scalaLong,
      Encoders.product[PaneCounters], TTLConfig.NONE)

  override def handleInputRows(
      cell: Int,
      rows: Iterator[CellEvent],
      timers: TimerValues): Iterator[WindowCount] = {
    val wm = timers.getCurrentWatermarkInMs()
    val out = scala.collection.mutable.ListBuffer.empty[WindowCount]
    // (tMs, rideId) batch determinization — earlyTriggerFn's contract:
    // the group iterator's order is shuffle-dependent, event-time
    // order makes the fire values a pure function of the event data.
    rows.toSeq.sortBy(e => (e.tMs, e.rideId)).foreach { e =>
      TaxiPipelines.windowEndsFor(e.tMs).foreach { wEnd =>
        if (wEnd > wm) { // late panes are dropped (Flink 0.10 default)
          val cur =
            if (panes.containsKey(wEnd)) panes.getValue(wEnd)
            else PaneCounters(0L, 0L)
          val sum = cur.sum + e.passengers
          val since = cur.sinceFire + e.passengers
          if (since >= threshold) { // FIRE: emit, keep contents
            out += WindowCount(cell, wEnd, sum, isFinal = false)
            panes.updateValue(wEnd, PaneCounters(sum, 0L))
          } else {
            panes.updateValue(wEnd, PaneCounters(sum, since))
          }
        }
      }
    }
    // purge in data batches too, not just on timer expiry — a key
    // receiving data in the batch its old pane expires must not re-arm
    // a timer at a timestamp the watermark already passed
    out ++= purgeAndRearm(cell, wm)
    out.iterator
  }

  override def handleExpiredTimer(
      cell: Int,
      timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[WindowCount] =
    purgeAndRearm(cell, timers.getCurrentWatermarkInMs()).iterator

  /** FIRE_AND_PURGE every pane the watermark has passed (final sum,
    * pane removed) and re-arm the single per-key timer at the
    * earliest surviving pane end.
    */
  private def purgeAndRearm(cell: Int, wm: Long): Seq[WindowCount] = {
    val keys = panes.keys().toSeq // materialize before mutating
    val (ripe, live) = keys.partition(_ <= wm)
    val fires = ripe.sorted.map { wEnd =>
      val c = panes.getValue(wEnd)
      panes.removeKey(wEnd)
      WindowCount(cell, wEnd, c.sum, isFinal = true)
    }
    val armed = getHandle.listTimers().toSeq
    if (live.nonEmpty) {
      val next = live.min
      if (armed != Seq(next)) {
        armed.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(next)
      }
    } else {
      armed.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    }
    fires
  }
}
