package graft.streaming

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** In-process TCP stand-in for the reference's per-record keyed store
  * (Elasticsearch via `TransportClient`,
  * `sinks/ElasticsearchUpsertSink.scala:54-81`): a line-protocol
  * upsert server with FAULT INJECTION, so the
  * [[ForeachKeyedUpsertWriter]]'s connection lifecycle
  * (open → per-record blocking upsert+ack → close) can be exercised
  * against the failures a network store actually produces —
  * connection loss before AND after the server applied the write, and
  * transient error replies — not just batch-level task failure.
  *
  * Protocol (UTF-8 lines): client sends `U\t<key>\t<payload>`, server
  * applies `map(key) = payload` and replies `OK`. Injection (every
  * `failEveryN`-th upsert request, counted across all connections)
  * cycles through three faults:
  *   - drop the connection BEFORE applying (the record is lost — the
  *     client must retry it);
  *   - apply, then drop BEFORE acking (the retry produces a duplicate
  *     write — convergence then depends on keyed idempotency, the
  *     exact property the reference's document-id upsert relies on);
  *   - reply `ERR` without dropping (a transient store rejection —
  *     retry on the same connection).
  *
  * The store itself is a driver-JVM `ConcurrentHashMap` — harness
  * scale by design (it simulates the EXTERNAL system, which at 100 TB
  * is a real ES/KV cluster; nothing about the Spark-side writer
  * changes there).
  */
final class SocketUpsertServer(failEveryN: Int = 0, firstFaultAt: Int = 0) {

  private val store = new ConcurrentHashMap[String, String]()
  private val serverSocket = new ServerSocket(0, 64, java.net.InetAddress.getLoopbackAddress)
  private val upserts = new AtomicInteger(0)
  private val faults = new AtomicInteger(0)
  private val accepted = new AtomicInteger(0)
  private val active = new AtomicInteger(0)
  @volatile private var running = true

  def port: Int = serverSocket.getLocalPort
  /** Total upsert requests seen (including ones a fault discarded). */
  def upsertCount: Int = upserts.get()
  /** Faults injected so far — specs assert this is non-zero so the
    * retry path is proven non-vacuously exercised.
    */
  def faultCount: Int = faults.get()
  /** Connections accepted — under injection this must exceed the
    * writer's partition count (each dropped connection forces a
    * reconnect).
    */
  def acceptedCount: Int = accepted.get()
  /** Connections currently open — 0 after the query stops proves every
    * `open()` was paired with a `close()`.
    */
  def activeCount: Int = active.get()

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = serverSocket.accept()
        accepted.incrementAndGet()
        val t = new Thread(() => handle(s), s"graft-upsert-conn-${accepted.get()}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // closed during accept
    }
  }, "graft-upsert-accept")
  acceptor.setDaemon(true)

  def start(): this.type = { acceptor.start(); this }

  private def handle(s: Socket): Unit = {
    active.incrementAndGet()
    try {
      s.setTcpNoDelay(true)
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, UTF_8))
      val out = new BufferedWriter(new OutputStreamWriter(s.getOutputStream, UTF_8))
      var line = in.readLine()
      while (line != null) {
        val parts = line.split('\t')
        if (parts.length >= 3 && parts(0) == "U") {
          val n = upserts.incrementAndGet()
          val key = parts(1)
          val payload = line.substring(line.indexOf('\t', line.indexOf('\t') + 1) + 1)
          if (failEveryN > 0 && (n % failEveryN == 0 || n == firstFaultAt)) {
            faults.incrementAndGet()
            // the one-shot early fault (firstFaultAt) guarantees the
            // retry path is exercised even on runs shorter than one
            // failEveryN period (small-SF plan sweeps); it drops the
            // connection after apply so the reconnect path fires too
            (if (n == firstFaultAt) 1 else (n / failEveryN) % 3) match {
              case 0 => return // drop before apply: record lost, client retries
              case 1 => store.put(key, payload); return // apply, drop before ack: retry duplicates
              case _ => out.write("ERR\n"); out.flush() // transient rejection, connection survives
            }
          } else {
            store.put(key, payload)
            out.write("OK\n"); out.flush()
          }
        } else { out.write("ERR\n"); out.flush() }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally {
      try s.close() catch { case _: Exception => () }
      active.decrementAndGet()
    }
  }

  /** Converged store contents. */
  def snapshot(): Map[String, String] = store.asScala.toMap

  /** Parse the stored payloads (tab-joined escaped fields, the
    * writer's wire form) back into a typed frame — the read side of
    * the stub, used by the oracle comparison. Field decode is the
    * writer's symmetric single-pass unescape (driver-side — the
    * snapshot is already driver-held, it IS the external store);
    * typing goes through Spark casts so numeric round-trips use the
    * same semantics as the engine.
    */
  def toDF(spark: SparkSession, schema: StructType): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField}
    val rows = store.values().asScala.toList.map { payload =>
      val fields = ForeachKeyedUpsertWriter.decodeFields(payload)
      require(fields.length == schema.length,
        s"payload arity ${fields.length} != schema arity ${schema.length}")
      Row.fromSeq(fields)
    }
    val strSchema = StructType(schema.map(f => StructField(f.name, StringType, nullable = true)))
    spark.createDataFrame(rows.asJava, strSchema)
      .select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  def close(): Unit = {
    running = false
    try serverSocket.close() catch { case _: Exception => () }
  }
}
