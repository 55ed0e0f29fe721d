package graft

import java.sql.Timestamp

import graft.streaming._
import org.apache.spark.sql.streaming.TestGroupState
import org.scalatest.funsuite.AnyFunSuite

/** Scripted early-trigger sequences (SURVEY.md §5.5): early fires at
  * ≥50-passenger multiples emit the *full* current pane sum (Flink
  * FIRE keeps contents), the since-fire counter resets, and the
  * watermark-driven final fire purges the pane (FIRE_AND_PURGE) —
  * semantics from `examples/EarlyArrivalCount.scala:117-160`.
  */
class EarlyTriggerSpec extends AnyFunSuite {

  private val T0 = 1_700_000_000_000L - (1_700_000_000_000L % 300000L) // slide-aligned
  private def ev(tOff: Long, p: Int) = CellEvent(1, tOff, new Timestamp(T0 + tOff), p)

  private def freshState(wmMs: Long): TestGroupState[Map[Long, (Long, Long)]] =
    TestGroupState.create[Map[Long, (Long, Long)]](
      optionalState = org.apache.spark.api.java.Optional.empty[Map[Long, (Long, Long)]](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wmMs)),
      hasTimedOut = false)

  test("every event lands in exactly 3 panes") {
    val ends = TaxiPipelines.windowEndsFor(T0 + 1)
    assert(ends.size == 3)
    assert(ends == Seq(T0 + 300000L, T0 + 600000L, T0 + 900000L))
  }

  test("early fire at threshold emits full sum and resets counter") {
    val state = freshState(0L)
    // 30 passengers: below threshold of 50 → no output
    val out1 = TaxiPipelines.earlyTriggerFn(50)(1, Iterator(ev(10, 30)), state).toList
    assert(out1.isEmpty)
    // +25 = 55 ≥ 50 → fire all 3 panes with the FULL sum (55), not 50
    val out2 = TaxiPipelines.earlyTriggerFn(50)(1, Iterator(ev(20, 25)), state).toList
    assert(out2.map(_.cnt) == List(55L, 55L, 55L))
    assert(out2.forall(!_.isFinal))
    // counter reset: +40 < 50 since last fire → silent, but sum keeps growing
    val out3 = TaxiPipelines.earlyTriggerFn(50)(1, Iterator(ev(30, 40)), state).toList
    assert(out3.isEmpty)
    // +15 = 55 since fire → fire with full sum 55+40+15 = 110
    val out4 = TaxiPipelines.earlyTriggerFn(50)(1, Iterator(ev(40, 15)), state).toList
    assert(out4.map(_.cnt) == List(110L, 110L, 110L))
  }

  test("watermark timeout emits finals and purges expired panes only") {
    val state = freshState(0L)
    TaxiPipelines.earlyTriggerFn(50)(1, Iterator(ev(10, 7)), state).toList
    assert(state.exists)
    // watermark past the first pane end only
    val timedOut = TestGroupState.create[Map[Long, (Long, Long)]](
      optionalState = org.apache.spark.api.java.Optional.of(state.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(T0 + 300001L)),
      hasTimedOut = true)
    val finals = TaxiPipelines.earlyTriggerFn(50)(1, Iterator.empty, timedOut).toList
    assert(finals == List(WindowCount(1, T0 + 300000L, 7L, isFinal = true)))
    // two later panes still live
    assert(timedOut.get.keySet == Set(T0 + 600000L, T0 + 900000L))
  }

  test("data batch with an already-expired pane final-fires it (no stale past timeout)") {
    // regression: a key that holds a pane the watermark has passed and
    // then receives NEW DATA (hasTimedOut = false) must purge the
    // expired pane in the data path too — otherwise it re-arms a
    // timeout at ≤ watermark, which GroupStateImpl rejects and the
    // query dies.
    val state = freshState(0L)
    TaxiPipelines.earlyTriggerFn(50)(1, Iterator(ev(10, 7)), state).toList
    val dataAfterExpiry = TestGroupState.create[Map[Long, (Long, Long)]](
      optionalState = org.apache.spark.api.java.Optional.of(state.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(T0 + 300001L)),
      hasTimedOut = false)
    val out = TaxiPipelines.earlyTriggerFn(50)(
      1, Iterator(ev(400000L, 3)), dataAfterExpiry).toList
    assert(out.contains(WindowCount(1, T0 + 300000L, 7L, isFinal = true)))
    // the re-armed timeout must be strictly after the watermark
    assert(dataAfterExpiry.getTimeoutTimestampMs.get() > T0 + 300001L)
  }

  test("late panes (window end ≤ watermark) are dropped") {
    val state = freshState(T0 + 600000L) // watermark past first two panes
    val out = TaxiPipelines.earlyTriggerFn(1)(1, Iterator(ev(10, 5)), state).toList
    // only the third pane is still open → single fire (threshold 1)
    assert(out == List(WindowCount(1, T0 + 900000L, 5L, isFinal = false)))
  }

  test("final counts equal plain sliding-window sums") {
    val rnd = new scala.util.Random(7)
    val events = Seq.fill(500)(ev(rnd.nextInt(3600) * 1000L, rnd.nextInt(4) + 1))
    // expected: per-pane sums
    val expected = events.flatMap(e => TaxiPipelines.windowEndsFor(e.tMs).map(_ -> e.passengers.toLong))
      .groupMapReduce(_._1)(_._2)(_ + _)
    // drive the state machine event-by-event, then time out everything
    val state = freshState(0L)
    val earlies = events.flatMap(e => TaxiPipelines.earlyTriggerFn(50)(1, Iterator(e), state).toList)
    val timedOut = TestGroupState.create[Map[Long, (Long, Long)]](
      optionalState = org.apache.spark.api.java.Optional.of(state.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(Long.MaxValue / 2)),
      hasTimedOut = true)
    val finals = TaxiPipelines.earlyTriggerFn(50)(1, Iterator.empty, timedOut).toList
    assert(finals.map(w => w.wEndMs -> w.cnt).toMap == expected)
    // early fires are monotone prefixes of the final count per pane
    earlies.groupBy(_.wEndMs).foreach { case (wEnd, fires) =>
      val cnts = fires.map(_.cnt)
      assert(cnts == cnts.sorted)
      assert(cnts.last <= expected(wEnd))
    }
    assert(!timedOut.exists) // all panes purged
  }

  test("early fire sums are strictly increasing per pane") {
    // The invariant earlyFiresStream's `seq` ordering depends on:
    // ORDER BY cnt recovers emission order only if per-pane fire sums
    // never repeat. Each FIRE requires ≥ threshold (> 0) NEW
    // passengers since the previous fire, so consecutive fire sums
    // differ by at least the threshold — strictly increasing, no ties.
    // Low threshold + many events → long multi-fire sequences.
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val events = Seq.fill(800)(ev(rnd.nextInt(3600) * 1000L, rnd.nextInt(4) + 1))
      val state = freshState(0L)
      val threshold = 3
      val earlies = events.flatMap(e =>
        TaxiPipelines.earlyTriggerFn(threshold)(1, Iterator(e), state).toList)
      val byPane = earlies.groupBy(_.wEndMs)
      assert(byPane.values.exists(_.size > 3)) // multi-fire sequences exercised
      byPane.foreach { case (_, fires) =>
        val cnts = fires.map(_.cnt)
        cnts.zip(cnts.tail).foreach { case (a, b) =>
          assert(a + threshold <= b, s"fire sums not strictly increasing: $cnts")
        }
      }
    }
  }
}
