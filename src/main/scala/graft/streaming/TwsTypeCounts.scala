package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One arriving user event for the type-count stream. */
final case class TypedEvent(userId: Long, eventType: String)

/** One Update-mode emission: a user's current count for one type. */
final case class TypeCount(user_id: Long, event_type: String, n: Long)

/** Per-user per-type running counts on transformWithState's MAP
  * state — the third state primitive (after the running total's
  * ValueState and the debounce's ListState): one `MapState[type →
  * count]` per user, point-updated per arriving event, emitting only
  * the (user, type) cells the batch CHANGED (delta emission — the
  * upsert sink's last-write-wins makes the converged table equal the
  * batch pivot's long form). State per key is bounded by |event
  * types|, and a map PUT touches one cell — unlike a ValueState
  * holding the whole map, which would rewrite every type's count on
  * each event (the RocksDB-backed MapState point-write is the reason
  * this primitive exists).
  */
class TypeCountProcessor
    extends StatefulProcessor[Long, TypedEvent, TypeCount] {
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState("counts", Encoders.STRING,
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      user: Long,
      rows: Iterator[TypedEvent],
      timers: TimerValues): Iterator[TypeCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { e =>
      val cur = if (counts.containsKey(e.eventType)) counts.getValue(e.eventType) else 0L
      counts.updateValue(e.eventType, cur + 1L)
      touched += e.eventType
    }
    touched.iterator.map(t => TypeCount(user, t, counts.getValue(t)))
  }
}
