package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key running count whose ValueState carries a REAL TTL — the
  * bounded-state lever every other TWS entry declines
  * (`TTLConfig.NONE`): state untouched for [[ttlMs]] of processing
  * time is evicted by the store itself, no timer bookkeeping in the
  * processor. At 100 TB this is how an unbounded key domain (users,
  * sessions, IPs) runs in bounded state WITHOUT watermark semantics:
  * keys that go quiet age out, returning keys restart their fold —
  * the cache-shaped contract (vs the watermark's "finished windows
  * drop" and the sketch entries' "state never grows"). Emits the
  * fold's current sum plus whether PRIOR state existed this batch,
  * so a spec can observe the eviction seam directly.
  */
final case class TtlOut(k: Int, sum: Long, resumed: Boolean)

class TtlCountProcessor(ttlMs: Long) extends StatefulProcessor[Int, EvoKV, TtlOut] {
  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState("cnt", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(
      k: Int, rows: Iterator[EvoKV], timers: TimerValues): Iterator[TtlOut] = {
    val prior = if (st.exists()) Option(st.get()) else None
    var s = prior.getOrElse(0L)
    rows.foreach(r => s += r.v)
    st.update(s)
    Iterator.single(TtlOut(k, s, prior.isDefined))
  }
}
