package graft

import graft.streaming._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The file-based streaming ingress (CSV file drops in the reference's
  * wire format, one chunk per micro-batch) converges to the same
  * per-cell totals as computing over the events in batch.
  */
class FileStreamReplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("CSV file-drop replay converges to batch totals") {
    // wire format is seconds-resolution → truncate event times first
    val rides = TaxiReplay.ridesFromEvents(spark, "/root/testdata/sf0.001")
      .collect().toSeq
      .map(e => e.copy(tMs = e.tMs - e.tMs % 1000))
    val ordered = TaxiReplay.servingOrder(rides, 60000L)

    val (stream, chunkDir) = TaxiReplay.fileStream(spark, ordered, nChunks = 3)
    val sink = new KeyedUpsertSink(Seq("cell"))
    val ckpt = TempDir.create("graft-fs-ckpt-")
    val q = TaxiPipelines.totalArrivalCount(stream)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch(sink.upsert _)
      .start()
    val got =
      try {
        q.processAllAvailable()
        sink.toDF(spark)
          .select("cell", "last_t_ms", "cnt")
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      } finally {
        q.stop()
        TempDir.deleteRecursively(ckpt.toString)
        TempDir.deleteRecursively(chunkDir)
        sink.close()
      }

    import spark.implicits._
    val expected = rides.filter(e => !e.isStart)
      .filter(e => e.lon >= -74.05 && e.lon <= -73.7 && e.lat >= 40.5 && e.lat <= 41.0)
      .toDF()
      .select(graft.geo.NycGeo.gridCell(col("lon"), col("lat")).as("cell"),
        col("tMs"), col("passengers"))
      .groupBy("cell")
      .agg(max("tMs").as("last_t_ms"), sum("passengers").as("cnt"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("flush chunk applies the sentinel watermark in Append mode") {
    // The Append-mode file path needs the trailing flush chunk: with
    // no-data micro-batches disabled, the watermark the sentinel
    // chunk advances is only APPLIED by a following data batch. This
    // pins the taxi_sliding_file_stream mechanism at spec level: all
    // panes (including the tail ones) emit, and the result equals the
    // batch sliding counts over seconds-truncated times.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val rides = TaxiReplay.ridesFromEvents(ss, "/root/testdata/sf0.001")
      .collect().toSeq
      .map(e => e.copy(tMs = e.tMs - e.tMs % 1000))
    val sentinel = TaxiReplay.sentinelAfter(rides)
    val ordered = TaxiReplay.servingOrder(rides, 60000L) :+ sentinel

    // gzip = true covers the reference's actual gz wire form here;
    // the update-mode test above keeps the plain-text path covered
    val (stream, chunkDir) =
      TaxiReplay.fileStream(ss, ordered, nChunks = 3,
        flushChunk = Seq(sentinel), gzip = true)
    val ckpt = TempDir.create("graft-fsflush-ckpt-")
    val name = "fsflush_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = TaxiPipelines.slidingArrivalCount(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("memory").queryName(name)
      .start()
    val got =
      try {
        q.processAllAvailable()
        ss.table(name).filter(col("cnt") > 0)
          .select("cell", "w_end_ms", "cnt")
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      } finally {
        q.stop()
        TempDir.deleteRecursively(ckpt.toString)
        TempDir.deleteRecursively(chunkDir)
      }

    import spark.implicits._
    val cellRows = rides.filter(e => !e.isStart)
      .filter(e => e.lon >= -74.05 && e.lon <= -73.7 && e.lat >= 40.5 && e.lat <= 41.0)
      .toDF()
      .select(graft.geo.NycGeo.gridCell(col("lon"), col("lat")).as("cell"),
        col("tMs"), col("passengers"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val expected = cellRows.toSeq
      .flatMap { case (cell, tMs, p) =>
        TaxiPipelines.windowEndsFor(tMs).map(w => (cell, w) -> p.toLong) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
