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
}
