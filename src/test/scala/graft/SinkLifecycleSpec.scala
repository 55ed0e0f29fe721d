package graft

import graft.queries.StreamingQueries
import graft.streaming.{ForeachKeyedUpsertWriter, SocketUpsertServer, TempDir}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.StateStoreBridge
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The CONNECTION-LIFECYCLE half of the O14 sink contract (reference
  * `sinks/ElasticsearchUpsertSink.scala:54-81`: a `TransportClient`
  * opened in `open()`, one blocking upsert per record, closed in
  * `close()`). `SinkRetrySpec` proves batch-level replay convergence;
  * this spec proves the per-record boundary: a network connection per
  * partition per epoch that DIES MID-STREAM (before apply, after
  * apply, and via transient rejections) and must be re-opened and the
  * in-flight record retried — converging exactly because the store
  * upserts by key.
  */
class SinkLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val outSchema = StructType(Seq(
    StructField("k", StringType), StructField("cnt", LongType)))

  test("per-record writer retries through injected connection loss and converges; every open is closed") {
    val ss = StreamingQueries.streamSession(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    // keys deliberately include the wire-hostile characters (tab,
    // newline, backslash) so the escape layer is exercised end-to-end
    val keys = Seq("a\tb", "c\nd", "e\\f", "plain", "␀-ish")
    // inject aggressively: every 3rd upsert faults, cycling
    // drop-before-apply / apply-then-drop / transient ERR
    val server = new SocketUpsertServer(failEveryN = 3).start()
    val ms = MemoryStream[(String, Int)]
    val ckpt = TempDir.create("graft-lifecycle-ckpt-")
    val q = ms.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreach(new ForeachKeyedUpsertWriter("127.0.0.1", server.port, nKey = 1))
      .start()
    try {
      ms.addData(keys.flatMap(k => Seq(k -> 1, k -> 2)))
      q.processAllAvailable()
      ms.addData(keys.take(3).map(_ -> 3))
      q.processAllAvailable()
    } finally {
      q.stop()
      TempDir.deleteRecursively(ckpt.toString)
      StateStoreBridge.unloadAll()
    }

    // non-vacuity: the fault injector must actually have fired, and
    // each dropped connection forces a reconnect beyond the baseline
    // one-connection-per-partition-per-epoch
    assert(server.faultCount > 0, s"no faults injected in ${server.upsertCount} upserts")
    assert(server.acceptedCount > 2,
      s"injected drops must force reconnects (accepted=${server.acceptedCount})")

    // convergence: the store equals the batch truth despite lost
    // connections, duplicated writes, and transient rejections
    val got = server.toDF(ss, outSchema)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = keys.map(k => k -> (if (keys.take(3).contains(k)) 3L else 2L)).toMap
    assert(got == expected)

    // lifecycle pairing: after q.stop every writer close() has run and
    // no connection is left open (poll briefly — server-side teardown
    // of the last FIN is asynchronous)
    val deadline = System.nanoTime() + 5_000_000_000L
    while (server.activeCount > 0 && System.nanoTime() < deadline) Thread.sleep(20)
    assert(server.activeCount == 0,
      s"${server.activeCount} connections still open after stop — open()/close() unbalanced")
    server.close()
  }

  test("retry exhaustion fails the micro-batch instead of dropping the record") {
    val ss = StreamingQueries.streamSession(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    // every request faults -> a record can never be acked; the writer
    // must rethrow after maxRetries so Spark fails the batch (the
    // at-least-once guarantee: no silent drop)
    val server = new SocketUpsertServer(failEveryN = 1).start()
    val ms = MemoryStream[(String, Int)]
    val ckpt = TempDir.create("graft-lifecycle-ckpt-")
    val q = ms.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreach(new ForeachKeyedUpsertWriter("127.0.0.1", server.port, nKey = 1, maxRetries = 2))
      .start()
    try {
      ms.addData(Seq("k1" -> 1))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.toString.contains("IOException") || e.getCause != null, e.toString)
    } finally {
      q.stop()
      TempDir.deleteRecursively(ckpt.toString)
      StateStoreBridge.unloadAll()
      server.close()
    }
    assert(server.faultCount >= 3, "writer must have retried before failing the batch")
  }

  test("wire encode/decode round-trips hostile fields and nulls") {
    val row = Row("a\tb\nc\\d", null, 42L, 1.5f, "␀")
    val line = ForeachKeyedUpsertWriter.encode(row, nKey = 1)
    // the payload is everything after the second tab
    val payload = line.split('\t').drop(2).mkString("\t")
    val back = ForeachKeyedUpsertWriter.decodeFields(payload)
    assert(back == Seq("a\tb\nc\\d", null, "42", "1.5", "␀"))
    // key join must not collide with field content
    assert(line.startsWith("U\ta\\tb\\nc\\\\d\t"))
  }
}
