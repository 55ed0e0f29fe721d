package graft

import graft.streaming.{Funnel, FunnelEvent, FunnelResult, FunnelState}
import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for the streaming funnel's per-user transition
  * ([[Funnel.funnelFn]]), driven directly with a fake GroupState: the
  * watermark-ordered fold, the finality bound, out-of-order arrival
  * inside the horizon, and the state-removal guarantees the 100 TB
  * bounded-state story rests on. The value-level batch equivalence is
  * the `events_funnel_stream` oracle.
  */
class FunnelSpec extends AnyFunSuite {

  private val W = Funnel.WindowMs

  /** Minimal GroupState stub over the three calls funnelFn makes. */
  private final class FakeState(var wm: Long) extends GroupState[FunnelState] {
    var st: Option[FunnelState] = None
    var timeout: Option[Long] = None
    var removed = false
    override def exists: Boolean = st.isDefined
    override def get: FunnelState = st.get
    override def getOption: Option[FunnelState] = st
    override def update(s: FunnelState): Unit = { st = Some(s); removed = false }
    override def remove(): Unit = { st = None; removed = true }
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ???
    override def setTimeoutDuration(d: String): Unit = ???
    override def setTimeoutTimestamp(t: Long): Unit = { timeout = Some(t) }
    override def setTimeoutTimestamp(t: Long, additionalDuration: String): Unit = ???
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ???
    override def setTimeoutTimestamp(t: java.sql.Date, additionalDuration: String): Unit = ???
    override def getCurrentWatermarkMs(): Long = wm
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private def step(
      state: FakeState,
      events: Seq[(Long, String)]): Seq[FunnelResult] =
    Funnel.funnelFn(7L,
      events.map { case (t, ty) => FunnelEvent(7L, t, ty) }.iterator,
      state).toList

  test("full funnel decides immediately once purchase lands") {
    val s = new FakeState(0L) // first batch: watermark still unset
    assert(step(s, Seq(100L -> "view", 200L -> "click", 300L -> "purchase")).isEmpty)
    s.wm = 301L // everything ripe
    val out = step(s, Nil)
    assert(out == Seq(FunnelResult(7L, 3, 100L, Some(200L), Some(300L))))
    assert(s.st.exists(_.done), "decided user must tombstone")
    // later events for a decided user change nothing and emit nothing
    assert(step(s, Seq(400L -> "view", 500L -> "purchase")).isEmpty)
    assert(s.st.exists(_.done))
  }

  test("arrival order never changes the outcome (fold is watermark-ordered)") {
    val s = new FakeState(0L)
    // click delivered BEFORE the earlier view it must qualify against
    assert(step(s, Seq(200L -> "click", 100L -> "view")).isEmpty)
    s.wm = 200L + W // stage-3 bound passed with no purchase: decided at 2
    val out = step(s, Nil)
    assert(out.map(r => (r.reached, r.t1_ms, r.t2_ms)) == Seq((2, 100L, Some(200L))))
  }

  test("stage 2 outside the window finalizes reached=1 at the bound") {
    val s = new FakeState(0L)
    assert(step(s, Seq(100L -> "view", (100L + W + 1) -> "click")).isEmpty)
    s.wm = 100L + W
    val out = step(s, Nil)
    assert(out == Seq(FunnelResult(7L, 1, 100L, None, None)))
    assert(s.st.exists(_.done))
  }

  test("undecided user sets the finality bound as its wake-up") {
    val s = new FakeState(0L)
    step(s, Seq(100L -> "view"))
    s.wm = 150L
    step(s, Nil)
    assert(s.timeout.contains(100L + W))
    assert(s.st.exists(st => st.t1 == 100L && st.pending.isEmpty))
  }

  test("stage events before any view can never qualify; state is dropped") {
    val s = new FakeState(0L)
    step(s, Seq(100L -> "click", 200L -> "purchase"))
    s.wm = 500L
    assert(step(s, Nil).isEmpty)
    assert(s.removed, "no stage-1, nothing buffered: state must not linger")
  }

  test("late-beyond-watermark events drop (the declared contract)") {
    val s = new FakeState(1000L)
    assert(step(s, Seq(50L -> "view")).isEmpty) // 50 <= wm: dropped
    assert(s.removed)
  }
}
