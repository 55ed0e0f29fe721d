package graft

import graft.streaming.{CellEvent, TempDir, TotalCountProcessor}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.StateStoreBridge
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery on the NEW stateful API: `StreamRecoverySpec`
  * pins restart semantics for the HDFS-backed provider's
  * dedup-within-watermark state, but transformWithState rides a
  * different recovery machinery entirely — RocksDB snapshot +
  * changelog reload per partition, the StatefulProcessor handle
  * re-`init`, and named-state re-registration. This spec stops a
  * TWS query mid-feed and resumes it from the same checkpoint with a
  * NEW query (and a fresh MemoryStream offset log would be wrong —
  * the same stream instance carries the uncommitted tail), asserting
  * the restored ValueState folds the remainder onto the pre-crash
  * totals exactly — the restart-a-100-TB-ingest contract the
  * bootstrap entry's scaladoc promises but no test exercised.
  */
class TwsRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("transformWithState resumes RocksDB state from checkpoint across query restart") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext

    val T = 1_700_000_000_000L
    val ms = MemoryStream[(Int, Long, Long, Int)] // cell, rideId, tMs, passengers
    val ckpt = TempDir.create("graft-twsrec-")
    // memory sink refuses checkpoint recovery; foreachBatch into a
    // driver-side buffer is the recoverable sink a spec can read back
    val emitted = new scala.collection.mutable.ArrayBuffer[(Long, Int, Long)] // batch, cell, cnt
    def start() = ms.toDF().toDF("cell", "rideId", "tMs", "passengers")
      .select(col("cell"), col("rideId"),
        timestamp_millis(col("tMs")).as("ts"), col("passengers"))
      .withWatermark("ts", "60 seconds")
      .as[CellEvent]
      .groupByKey(_.cell)
      .transformWithState(new TotalCountProcessor(),
        TimeMode.EventTime(), OutputMode.Update())
      .toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.collect().map(r => (id, r.getInt(0), r.getLong(2)))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()

    try {
      val q1 = start()
      try {
        ms.addData(Seq((1, 10L, T, 3), (2, 20L, T, 5)))
        q1.processAllAvailable()
        ms.addData(Seq((1, 11L, T + 1000, 4)))
        q1.processAllAvailable()
      } finally q1.stop() // "crash" after two committed batches
      // cell totals at the stop point: 1 -> 7, 2 -> 5
      val batchesBefore = emitted.synchronized(emitted.map(_._1).max)

      val q2 = start() // new incarnation, same checkpoint
      try {
        ms.addData(Seq((1, 12L, T + 2000, 10), (3, 30L, T + 2000, 1)))
        q2.processAllAvailable()
      } finally q2.stop()

      // emissions from the resumed incarnation only: the restored
      // RocksDB ValueState must fold the new batch onto the OLD sums
      val resumed = emitted.synchronized(
        emitted.filter(_._1 > batchesBefore).map(e => e._2 -> e._3).toMap)
      assert(resumed.get(1).contains(17L),
        s"cell 1 must resume 7 and fold +10 -> 17, got $resumed")
      assert(resumed.get(3).contains(1L), s"fresh key after restart wrong: $resumed")
      // cell 2 got no new data; Update mode only re-emits touched keys,
      // so its restored state is visible through cell 1's correctness,
      // not a new emission
      assert(!resumed.contains(2), s"untouched key must not re-emit: $resumed")
    } finally {
      TempDir.deleteRecursively(ckpt.toString)
      StateStoreBridge.unloadAll()
    }
  }
}
