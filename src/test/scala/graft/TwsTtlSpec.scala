package graft

import graft.streaming.{EvoKV, TempDir, TtlCountProcessor, TtlOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.graftbridge.StateStoreBridge
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** State TTL on the new stateful API — the bounded-state contract no
  * oracle entry can express (eviction is a function of processing
  * time): a key re-fed INSIDE its TTL resumes its fold; a key that
  * stayed quiet past the TTL restarts from zero because the store
  * itself evicted the value. Margins are deliberately wide (TTL 15 s —
  * far above any inter-batch latency — quiet gap 20 s) — the spec pins semantics, not timing precision.
  */
class TwsTtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("quiet keys age out past the TTL; active keys resume within it") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val ms = MemoryStream[(Int, Long)]
    val ckpt = TempDir.create("graft-twsttl-")
    val emitted = new scala.collection.mutable.ArrayBuffer[(Long, TtlOut)]
    val q = ms.toDF().toDF("k", "v").as[EvoKV]
      .groupByKey(_.k)
      .transformWithState(new TtlCountProcessor(ttlMs = 15000L),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.as[TtlOut].collect().map(id -> _)
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    try {
      ms.addData(Seq((1, 10L), (2, 5L)))
      q.processAllAvailable()
      // key 1 re-fed well INSIDE the TTL: the fold must resume
      ms.addData(Seq((1, 7L)))
      q.processAllAvailable()
      val inTtl = emitted.synchronized(emitted.toList)
        .collect { case (_, o) if o.k == 1 => o }.last
      assert(inTtl == TtlOut(1, 17L, resumed = true),
        s"key 1 inside TTL must resume the fold: $inTtl")

      Thread.sleep(20000L) // both keys quiet well past the 15 s TTL
      ms.addData(Seq((1, 100L), (2, 1L)))
      q.processAllAvailable()
      val after = emitted.synchronized(emitted.toList)
        .collect { case (_, o) => o.k -> o }.toMap
      assert(after(1) == TtlOut(1, 100L, resumed = false),
        s"key 1 past TTL must restart from zero: ${after(1)}")
      assert(after(2) == TtlOut(2, 1L, resumed = false),
        s"key 2 past TTL must restart from zero: ${after(2)}")
    } finally {
      q.stop()
      StateStoreBridge.unloadQuery(q.runId)
      TempDir.deleteRecursively(ckpt.toString)
    }
  }
}
