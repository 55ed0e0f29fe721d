package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The conversion funnel (view → click → purchase, 24 h per step) as a
  * streaming per-user state machine — the CEP-style ordered-sequence
  * pattern match, batch twin `events_funnel`.
  *
  * Same watermark-ordered fold contract as
  * [[TaxiPipelines.runningCountPerEvent]]: events buffer in state
  * until the watermark passes them, then fold in event-time order
  * through the stage machine, so arrival order never changes the
  * outcome. The chained-min semantics make each stage FIRST-qualifying
  * = minimal, and folding in time order means a stage value, once set,
  * can never improve — which yields a finality bound: a user's funnel
  * is decided when the watermark passes
  *   t3 set → immediately; else t2 set → t2 + W; else t1 set → t1 + W.
  * On that bound the state machine emits its single final row; the
  * remaining state is an O(1) done-tombstone (see [[FunnelState]]) —
  * so the HEAVY state (event buffers, live timeouts) is bounded by
  * users whose funnel is still open inside the watermark horizon,
  * and converted users cost three longs until a TTL reaps them.
  */
object Funnel {

  val WindowMs: Long = graft.queries.EventQueries.FunnelWindowMs

  def funnelResults(events: Dataset[FunnelEvent]): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(funnelFn)
  }

  /** Per-user transition. Public for direct unit testing. */
  def funnelFn(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelResult] = {
    val wm =
      if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs()
      else Long.MinValue
    var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, Nil, done = false))
    if (st.done) return Iterator.empty // decided: later events change nothing
    // buffer new events (anything at/before the watermark is late — drop)
    events.foreach { e =>
      if (e.tMs > wm) st = st.copy(pending = (e.tMs, e.etype) :: st.pending)
    }
    // fold everything the watermark has passed, in event-time order
    val (ripe, keep) = st.pending.partition(_._1 <= wm)
    var (t1, t2, t3) = (st.t1, st.t2, st.t3)
    ripe.sortBy(_._1).foreach { case (t, ty) =>
      ty match {
        case "view" =>
          if (t1 < 0) t1 = t
        case "click" =>
          if (t1 >= 0 && t2 < 0 && t > t1 && t <= t1 + WindowMs) t2 = t
        case "purchase" =>
          if (t2 >= 0 && t3 < 0 && t > t2 && t <= t2 + WindowMs) t3 = t
        case _ =>
      }
    }
    val decided = t1 >= 0 && (t3 >= 0 ||
      (t2 >= 0 && wm >= t2 + WindowMs) ||
      (t2 < 0 && wm >= t1 + WindowMs))
    if (decided) {
      // tombstone, not remove: stage 1 is a lifetime min, so a decided
      // user must stay remembered or a later view would open a second
      // funnel and double-emit. O(1), no buffer, no timeout; at scale a
      // TTL can reap tombstones once the product's attribution horizon
      // closes.
      state.update(FunnelState(t1, t2, t3, Nil, done = true))
      Iterator.single(FunnelResult(
        userId,
        1 + (if (t2 >= 0) 1 else 0) + (if (t3 >= 0) 1 else 0),
        t1,
        if (t2 >= 0) Some(t2) else None,
        if (t3 >= 0) Some(t3) else None))
    } else {
      val next = FunnelState(t1, t2, t3, keep, done = false)
      // Wake at the PROJECTED decision time, not at the next buffered
      // event: simulate the chained-min fold over everything known
      // (ripe stages + the still-unripe buffer, in event-time order)
      // and arm one timer at the bound that projection yields. If no
      // further events arrive, the projection IS the decision time, so
      // the user is invoked exactly once more instead of once per
      // micro-batch as each buffered event ripens (measured at ~1500
      // open users × one wasted wake per batch — pure state-IO churn:
      // a wake below the decision bound can never emit). A later
      // arrival re-invokes the function with data and re-arms; the
      // `decided` check above stays authoritative on every invocation,
      // so the wake time is only a scheduling heuristic, never a
      // semantic input.
      var (v1, v2, v3) = (t1, t2, t3)
      keep.sortBy(_._1).foreach { case (t, ty) =>
        ty match {
          case "view" => if (v1 < 0) v1 = t
          case "click" =>
            if (v1 >= 0 && v2 < 0 && t > v1 && t <= v1 + WindowMs) v2 = t
          case "purchase" =>
            if (v2 >= 0 && v3 < 0 && t > v2 && t <= v2 + WindowMs) v3 = t
          case _ =>
        }
      }
      val wake =
        if (v3 >= 0) v3 // all three ripe at that watermark: decides
        else if (v2 >= 0) v2 + WindowMs
        else if (v1 >= 0) v1 + WindowMs
        // no view known: buffered stage-2/3 events can't decide
        // anything on their own — wake as they ripen and fold away
        else keep.map(_._1).minOption.getOrElse(Long.MaxValue)
      if (wake == Long.MaxValue) state.remove() // no first stage, nothing buffered
      else {
        state.update(next)
        state.setTimeoutTimestamp(wake)
      }
      Iterator.empty
    }
  }
}
