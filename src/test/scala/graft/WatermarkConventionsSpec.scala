package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical pins of the watermark conventions the streaming entries
  * rest on (probed on this engine build; a Spark upgrade shifting any
  * of them fails a named test here instead of silently changing
  * `taxi_late_drop`'s drop set or an Update entry's convergence):
  *
  *  - the watermark advanced by batch N is APPLIED in batch N+1 (the
  *    one-batch lag the flush-chunk scaffolding already documents);
  *  - Append-mode aggregation drops a late row only when its event
  *    time is STRICTLY below the effective watermark — a row at
  *    exactly the watermark is kept;
  *  - Update-mode aggregation does NOT drop late rows at all: they
  *    re-create state and emit (the replay entries converge because
  *    the feed is serving-ordered, not because the engine filters) —
  *    the sharp edge a user migrating an Append job to Update must
  *    know.
  */
class WatermarkConventionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(mode: String)(feed: (Seq[Long] => Unit) => Unit): Map[Long, Long] = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import ss.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val ms = MemoryStream[Long]
    val name = "wmconv" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = ms.toDF().select(timestamp_millis(col("value")).as("ts"))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds")).agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w"), col("n"))
      .writeStream.outputMode(mode).format("memory").queryName(name).start()
    // one micro-batch per step: drain between adds so each step's
    // watermark advancement is visible to the next
    try feed(xs => { ms.addData(xs); q.processAllAvailable() })
    finally q.stop()
    // keep the LAST emission per pane (Update re-emits)
    ss.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("Append: strict-below drop, at-watermark keep, one-batch watermark lag") {
    val got = run("append") { step =>
      step(Seq(200000L)) // wm -> 200000 after this batch
      step(Seq(400000L)) // runs under wm=200000; wm -> 400000 after
      // this batch runs under the wm advanced by batch 1 = 200000:
      // 200000 == wm is KEPT, 199999/150000 < wm are dropped
      step(Seq(200000L, 199999L, 150000L, 405000L))
      step(Seq(600000L)) // finalizes panes whose end ≤ effective wm
      step(Seq(600000L)) // one more batch applies the 600000 wm
    }
    // pane 200000: original + the late row at EXACTLY the lagged
    // watermark (kept) = 2; panes 190000/150000: strictly-late rows
    // dropped (never emitted); pane 400000: 400000 + 405000 = 2
    assert(got.get(200000L).contains(2L), s"at-watermark row was dropped: $got")
    assert(!got.contains(190000L) && !got.contains(150000L),
      s"strictly-late rows were not dropped: $got")
    assert(got.get(400000L).contains(2L), got.toString)
  }

  test("Update: late rows are NOT dropped - they re-create state and emit") {
    val got = run("update") { step =>
      step(Seq(200000L)) // wm -> 200000
      step(Seq(199999L, 150000L, 205000L))
    }
    assert(got.get(190000L).contains(1L) && got.get(150000L).contains(1L),
      s"Update mode dropped late rows — the convention changed: $got")
  }

  /** The sentinel-filter trap `events_union_stream` hit, pinned as a
    * convention: Catalyst pushes a deterministic NON-event-time
    * predicate BELOW the EventTimeWatermark operator, so a pre-agg
    * filter on a sentinel key drops the sentinel before it can
    * advance the watermark — the tail panes never finalize. Both
    * halves pinned: the optimized plan shows the pushdown, and the
    * behavior shows the stranded panes (the filtered run emits
    * nothing where the unfiltered run emits every closed pane).
    */
  test("non-event-time filters push below the watermark node and eat sentinels") {
    def run(filtered: Boolean): (Boolean, Map[Long, Long]) = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      import ss.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext
      val ms = MemoryStream[(Long, Long)]
      val base = ms.toDF().select(col("_1").as("id"),
        timestamp_millis(col("_2")).as("ts"))
        .withWatermark("ts", "0 seconds")
      val shaped = if (filtered) base.filter(col("id") =!= -1L) else base
      val agg = shaped
        .groupBy(window(col("ts"), "10 seconds")).agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")).as("w"), col("n"))
      val name = "wmpush" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      def step(xs: (Long, Long)*): Unit = { ms.addData(xs); q.processAllAvailable() }
      val pushed =
        try {
          step((1L, 5000L), (1L, 15000L)) // two panes of real data
          step((-1L, 500000L)) // far-future sentinel advances the wm...
          step((-1L, 500000L)) // ...and the next batch applies it
          // the micro-batch's EXECUTED plan shows where the filter landed
          q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
            .streamingQuery.lastExecution.executedPlan.collect {
              case wm: org.apache.spark.sql.execution.streaming.operators.stateful.EventTimeWatermarkExec
                  if wm.child.collect {
                    case f: org.apache.spark.sql.execution.FilterExec => f
                  }.nonEmpty => wm
            }.nonEmpty
        } finally q.stop()
      (pushed, ss.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    val (pushedWhenFiltered, gotFiltered) = run(filtered = true)
    assert(pushedWhenFiltered,
      "the id filter no longer plans below EventTimeWatermark — " +
        "the documented pushdown convention changed")
    // real data still advances the watermark for EARLIER panes (the
    // 15 s row closes pane 0); it is the TAIL pane that strands —
    // exactly the 595/600 shape the union entry hit
    assert(gotFiltered == Map(0L -> 1L),
      s"filtered sentinels should strand the tail pane (the trap): $gotFiltered")
    val (_, gotOpen) = run(filtered = false)
    assert(gotOpen == Map(0L -> 1L, 10000L -> 1L),
      s"unfiltered sentinels must flush both real panes: $gotOpen")
  }
}
