package graft

import graft.tools.OpsReport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ops-report artifact must RECONCILE across its two independent
  * sources: the progress feed (what the job reported while running)
  * and the checkpoint state reader (what the store actually holds) —
  * the same contract `events_state_reader` pins through the DuckDB
  * oracle, extended to the operational numbers an on-call reads
  * (reference analytics dashboard, `README.md:137-172`).
  */
class OpsReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("progress feed, state reader, and batch truth reconcile") {
    val nChunks = 3
    val (stats, parts, md, fed) =
      OpsReport.collectFromEventsReplay(spark, sf, nChunks)

    // one micro-batch per chunk (maxFilesPerTrigger=1, no-data batches
    // disabled in the replay session)
    assert(stats.size == nChunks, s"expected $nChunks batches, got ${stats.size}")
    assert(stats.map(_.batchId) == (0L until nChunks.toLong))

    // conservation: every fed row is accounted for by exactly one batch
    assert(stats.map(_.inputRows).sum == fed)

    // the two state surfaces agree with each other AND with batch truth
    val finalReported = stats.last.stateRowsTotal
    val readerTotal = parts.map(_._2).sum
    val batchTruth = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(finalReported == readerTotal,
      s"progress state rows $finalReported != reader rows $readerTotal")
    assert(readerTotal == batchTruth,
      s"reader rows $readerTotal != distinct event types $batchTruth")

    // state growth is monotone for an ever-seen-keys aggregation
    assert(stats.map(_.stateRowsTotal) == stats.map(_.stateRowsTotal).sorted)
    // memory is reported, not zero-stubbed
    assert(stats.last.stateBytes > 0)

    // watermark lag: defined once the watermark advanced, and at least
    // the configured 60 s delay (watermark = prior max - delay)
    val lastLag = stats.last.watermarkLagMs
    assert(lastLag.isDefined, "watermarked pipeline must report event-time lag")
    assert(lastLag.get >= 60000L, s"lag ${lastLag.get} below the 60 s delay bound")

    // histogram partitions the batches exactly (fixed power-of-2 edges)
    val hist = OpsReport.latencyHistogram(stats.map(_.triggerMs))
    assert(hist.map(_._3).sum == stats.size)
    assert(hist.forall { case (lo, hi, _) => lo <= hi })

    // the rendered artifact carries the reconciliation verdict and the
    // operator coordinates
    val report = OpsReport.render("spec", stats, parts, md)
    assert(report.contains("reconciled") && !report.contains("MISMATCH"))
    assert(md.exists(_.contains("operator=stateStoreSave")))

    // the HTML dashboard half: self-contained (no external refs), one
    // bar per batch in the per-batch panels, verdict present
    val html = OpsReport.renderHtml("spec", stats, parts, md)
    assert(html.contains("reconciled") && !html.contains("MISMATCH"))
    assert(!html.contains("http://") && !html.contains("https://") &&
      !html.contains("<script"), "dashboard must be fully self-contained")
    val rects = "<rect ".r.findAllIn(html).size
    // 3 per-batch panels × nChunks bars + lag panel (nChunks-1: batch 0
    // has no initialized watermark) + one bar per state partition
    assert(rects == 3 * stats.size + (stats.size - 1) + parts.size,
      s"unexpected bar count $rects")
  }

  test("latency histogram buckets are disjoint, exhaustive power-of-2 ranges") {
    val h = OpsReport.latencyHistogram(Seq(0L, 1L, 2L, 3L, 4L, 1000L, 1500L))
    // 0-1, 2-3, 4-7, 512-1023, 1024-2047
    assert(h == Seq((0L, 1L, 2), (2L, 3L, 2), (4L, 7L, 1),
      (512L, 1023L, 1), (1024L, 2047L, 1)))
    assert(OpsReport.latencyHistogram(Nil).isEmpty)
  }
}
