package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One arriving event for the streaming debounce. */
final case class DebounceEvent(userId: Long, eventId: Long, tMs: Long)

/** One kept (emitted) event — matches the batch `events_debounce`
  * output columns.
  */
final case class KeptEvent(user_id: Long, event_id: Long)

/** Per-key DEBOUNCE as a STREAM on the transformWithState API with
  * EVENT-TIME TIMERS — the streaming twin of the batch
  * `events_debounce` fold, and the API surface the ValueState-only
  * `TotalCountProcessor` doesn't exercise: ListState buffering +
  * registerTimer/handleExpiredTimer.
  *
  * Debounce's fold is ORDER-DEPENDENT (the reference point is the
  * last SURVIVOR), so out-of-order arrival needs the runningFoldFn
  * anatomy: buffer events the watermark hasn't passed (ListState),
  * flush ripe ones in (t, id) order against the last-kept ValueState,
  * and let an event-time timer at the earliest buffered timestamp
  * wake keys that receive no further input. Emission is Append —
  * a kept event emits exactly once, when the watermark finalizes its
  * position in the order — so the full emitted set equals the batch
  * oracle on any bounded-disorder replay.
  *
  * State per key is bounded by the watermark delay (only
  * not-yet-flushable events buffer); exactly one live timer per key
  * (re-registered to the new minimum after each flush).
  */
class DebounceProcessor(windowMs: Long)
    extends StatefulProcessor[Long, DebounceEvent, KeptEvent] {
  @transient private var lastKept: ValueState[Long] = _
  @transient private var pending: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastKept = getHandle.getValueState("lastKept", Encoders.scalaLong,
      TTLConfig.NONE)
    pending = getHandle.getListState("pending",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[DebounceEvent],
      timers: TimerValues): Iterator[KeptEvent] = {
    val wm = timers.getCurrentWatermarkInMs()
    // anything at/before the watermark is late — drop (runningFoldFn
    // contract); the rest buffers until the watermark passes it
    rows.foreach { e =>
      if (e.tMs > wm) pending.appendValue((e.tMs, e.eventId))
    }
    flush(key, wm)
  }

  override def handleExpiredTimer(
      key: Long,
      timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[KeptEvent] =
    flush(key, timers.getCurrentWatermarkInMs(),
      expiredTimer = Some(expired.getExpiryTimeInMs()))

  /** Flush every buffered event the watermark has passed, in (t, id)
    * order, applying the keep-iff-≥window rule against the last
    * SURVIVOR; re-arm the single per-key timer at the earliest
    * remaining buffered timestamp.
    *
    * `expiredTimer`: the timer that fired this call (expired path
    * only). Spark deletes the fired timer itself AFTER the callback,
    * so the reconcile below excludes it — deleting it here made
    * Spark's own delete fail with a per-firing WARN (synchronous log
    * IO on the timed path) plus a redundant state delete.
    */
  private def flush(
      key: Long, wm: Long, expiredTimer: Option[Long] = None): Iterator[KeptEvent] = {
    val buf = if (pending.exists()) pending.get().toSeq else Seq.empty
    val (ripe, rest) = buf.partition(_._1 <= wm)
    val out = scala.collection.mutable.ListBuffer.empty[KeptEvent]
    if (ripe.nonEmpty) {
      var last: Option[Long] =
        if (lastKept.exists()) Some(lastKept.get()) else None
      ripe.sorted.foreach { case (t, id) =>
        if (last.forall(l => t - l >= windowMs)) {
          last = Some(t)
          out += KeptEvent(key, id)
        }
      }
      last.foreach(lastKept.update)
      if (rest.nonEmpty) pending.put(rest.toArray) else pending.clear()
    }
    // one live timer per key: drop stale ones, re-arm at the new min
    val live = getHandle.listTimers().toSeq
      .filterNot(t => expiredTimer.contains(t.asInstanceOf[Long]))
    if (rest.nonEmpty) {
      val next = rest.map(_._1).min
      if (live != Seq(next)) {
        live.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(next)
      }
    } else {
      live.foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    }
    out.iterator
  }
}
