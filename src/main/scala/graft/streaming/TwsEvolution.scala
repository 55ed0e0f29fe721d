package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** State-SCHEMA-EVOLUTION pair for `TwsSchemaEvolutionSpec`: the same
  * named state variable ("acc") read by two generations of a
  * processor whose state class GAINS a field between restarts — the
  * zero-downtime migration a 100 TB streaming job needs when its
  * state grows a dimension (nobody re-ingests a year of events to add
  * a max-tracker). Spark supports this on the transformWithState +
  * RocksDB path when state rows are encoded as Avro
  * (`spark.sql.streaming.stateStore.encodingFormat = avro`): Avro
  * resolves old-writer/new-reader schemas field-by-field, so v1 rows
  * surface in v2 with the added field null. The added field is
  * `Option[Long]` — evolution adds NULLABLE columns; a primitive
  * would have no representation for "written before the field
  * existed". Under the default UnsafeRow encoding the same restart
  * must be REFUSED at query start (binary layout admits no
  * evolution) — the spec pins both halves.
  */
final case class EvoKV(k: Int, v: Long)

/** Generation 1 state: running sum only. */
final case class EvoStateV1(sum: Long)

/** Generation 2 state: sum plus a max-tracker ADDED across restart.
  * `mx` is None exactly for keys whose state was written by v1.
  */
final case class EvoStateV2(sum: Long, mx: Option[Long])

final case class EvoOut(k: Int, sum: Long, mx: Long, legacy: Boolean)

class EvoV1Processor extends StatefulProcessor[Int, EvoKV, EvoOut] {
  @transient private var st: ValueState[EvoStateV1] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState("acc", Encoders.product[EvoStateV1],
      TTLConfig.NONE)

  override def handleInputRows(
      k: Int, rows: Iterator[EvoKV], timers: TimerValues): Iterator[EvoOut] = {
    var s = if (st.exists()) st.get() else EvoStateV1(0L)
    rows.foreach(r => s = EvoStateV1(s.sum + r.v))
    st.update(s)
    Iterator.single(EvoOut(k, s.sum, -1L, legacy = true))
  }
}

class EvoV2Processor extends StatefulProcessor[Int, EvoKV, EvoOut] {
  @transient private var st: ValueState[EvoStateV2] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState("acc", Encoders.product[EvoStateV2],
      TTLConfig.NONE)

  override def handleInputRows(
      k: Int, rows: Iterator[EvoKV], timers: TimerValues): Iterator[EvoOut] = {
    val prior = if (st.exists()) Option(st.get()) else None
    // a v1-written row surfaces with mx = None — the evolution seam
    val legacy = prior.exists(_.mx.isEmpty)
    var s = prior.getOrElse(EvoStateV2(0L, None))
    rows.foreach { r =>
      s = EvoStateV2(s.sum + r.v,
        Some(math.max(s.mx.getOrElse(Long.MinValue), r.v)))
    }
    st.update(s)
    Iterator.single(EvoOut(k, s.sum, s.mx.getOrElse(-1L), legacy))
  }
}
