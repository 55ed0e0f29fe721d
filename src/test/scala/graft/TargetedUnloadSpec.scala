package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.graftbridge.StateStoreBridge
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Pins the targeted teardown contract behind every StreamingQueries
  * replay entry (`StateStoreBridge.unloadQuery`): tearing down ONE
  * finished query must drop exactly that query's loaded state-store
  * providers and leave a concurrently-live query's providers loaded —
  * the r14 concurrency finding (ProbeConcurrency/SCALE.md: a global
  * `unloadAll` on one entry's teardown forces every other live query
  * to reload its stores from checkpoint on its next micro-batch; on a
  * real cluster that is a per-executor state flush of the whole
  * mixed workload).
  */
class TargetedUnloadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def startCount(ss: org.apache.spark.sql.SparkSession,
                         ms: MemoryStream[(String, Long)],
                         ckpt: String): StreamingQuery = {
    import ss.implicits._
    ms.toDF().toDF("k", "v")
      .groupBy($"k").count()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("memory")
      .queryName("tu_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      .start()
  }

  test("unloadQuery drops only the finished query's providers; the live query keeps its state warm") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    import graft.streaming.TempDir
    implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._

    val msA = MemoryStream[(String, Long)]
    val msB = MemoryStream[(String, Long)]
    val ckptA = TempDir.create("graft-tua-")
    val ckptB = TempDir.create("graft-tub-")
    val qA = startCount(ss, msA, ckptA.toString)
    val qB = startCount(ss, msB, ckptB.toString)
    try {
      msA.addData(("a", 1L), ("b", 2L)); qA.processAllAvailable()
      msB.addData(("x", 1L)); qB.processAllAvailable()

      val nA = StateStoreBridge.loadedCountForQuery(qA.runId)
      val nB = StateStoreBridge.loadedCountForQuery(qB.runId)
      assert(nA > 0, "query A should have loaded providers after a batch")
      assert(nB > 0, "query B should have loaded providers after a batch")

      // A finishes; its targeted teardown must not touch B
      qA.stop()
      val dropped = StateStoreBridge.unloadQuery(qA.runId)
      assert(dropped == nA, s"expected to drop exactly A's $nA providers, dropped $dropped")
      assert(StateStoreBridge.loadedCountForQuery(qA.runId) == 0)
      assert(StateStoreBridge.loadedCountForQuery(qB.runId) == nB,
        "live query B's providers must remain loaded after A's teardown")

      // B keeps processing on its still-warm state
      msB.addData(("x", 2L)); qB.processAllAvailable()
      val bRows = ss.table(qB.name).collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(bRows("x") == 2L, "B's running count must fold onto pre-teardown state")

      // idempotent: a second targeted unload finds nothing
      assert(StateStoreBridge.unloadQuery(qA.runId) == 0)
    } finally {
      if (qA.isActive) qA.stop()
      qB.stop()
      StateStoreBridge.unloadAll()
      graft.streaming.TempDir.deleteRecursively(ckptA.toString)
      graft.streaming.TempDir.deleteRecursively(ckptB.toString)
    }
  }
}
