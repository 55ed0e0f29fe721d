package graft.tools

import graft.streaming.{TaxiReplay, TempDir}
import org.apache.spark.sql.SparkSession

/** Serving-rate fidelity check for the paced live-demo replay
  * (O1's wall-clock pacing clause — reference `toServingTime`,
  * `sources/TaxiRideSource.scala:265-268`; 600× ⇒ 10 event-hours per
  * wall minute, `examples/TotalArrivalCount.scala:47`):
  *
  *   sbt "runMain graft.tools.PacedCheck [sfDir] [eventHours] [speed]"
  *
  * Slices the sf ride feed to its first `eventHours` of event time,
  * replays it through `replayPaced` at `speed` against a live
  * memory-sink query, and reports (a) the wall span vs the contract
  * span `eventSpan / speed`, (b) per-batch deadline lateness, (c) that
  * every event was served exactly once. Driver-side measurement tool;
  * results recorded in SCALE.md.
  */
object PacedCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val eventHours = args.drop(1).headOption.map(_.toDouble).getOrElse(12.0)
    val speed = args.drop(2).headOption.map(_.toDouble).getOrElse(600.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rides = TaxiReplay.ridesFromEvents(spark, sfDir).collect().toSeq
    val serving = TaxiReplay.servingOrder(rides, 60000L)
    val t0 = serving.head.tMs
    val horizonMs = (eventHours * 3600 * 1000).toLong
    val slice = serving.filter(_.tMs - t0 < horizonMs)
    val eventSpanMs = slice.last.tMs - t0
    val contractWallMs = eventSpanMs / speed
    println(f"[paced] ${slice.size} events over ${eventSpanMs / 3600000.0}%.2f " +
      f"event-hours at ${speed}%.0fx => contract wall ${contractWallMs / 1000.0}%.1f s")

    val (ms, df) = TaxiReplay.memoryStream(spark)
    val ckpt = TempDir.create("graft-paced-")
    val q = df.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName("paced_check")
      .start()
    try {
      val w0 = System.nanoTime()
      val lateness = TaxiReplay.replayPaced(ms, slice, speed)
      val wallMs = (System.nanoTime() - w0) / 1e6
      q.processAllAvailable()
      val served = spark.table("paced_check").count()
      val spanErrPct = 100.0 * (wallMs - contractWallMs) / contractWallMs
      val maxLate = lateness.max
      val meanLate = lateness.sum / lateness.size
      println(f"[paced] wall ${wallMs / 1000.0}%.2f s vs contract " +
        f"${contractWallMs / 1000.0}%.2f s => span error ${spanErrPct}%.2f%%")
      println(f"[paced] batches ${lateness.size}, deadline lateness " +
        f"mean ${meanLate}%.1f ms, max ${maxLate}%.1f ms")
      println(s"[paced] served $served of ${slice.size} events " +
        (if (served == slice.size) "(exact)" else "(MISMATCH)"))
    } finally {
      q.stop()
      TempDir.deleteRecursively(ckpt.toString)
    }
    spark.stop()
  }
}
