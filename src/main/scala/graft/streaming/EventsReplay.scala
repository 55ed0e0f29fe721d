package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-based streaming ingress for the `events` table — the generic
  * twin of [[DocsReplay]] (documents) and [[TaxiReplay.fileStream]]
  * (taxi CSV wire format): events arrive as gzipped JSONL chunk files
  * consumed by `readStream.text` + `from_json` with
  * `maxFilesPerTrigger = 1`, one chunk per micro-batch. This is the
  * production ingress shape of every event stream in this engine — at
  * 100 TB events land as object-store file drops (or a broker whose
  * Spark source exposes the same unbounded-DataFrame seam), never as a
  * driver-held collection. The MemoryStream variants remain only where
  * a pipeline needs mid-replay driver interaction (e.g. the
  * compact-mid-replay upsert entries); everything else feeds from
  * here, with the fixture chunk WRITING being test harness exactly as
  * in [[DocsReplay.writeChunk]].
  *
  * One wire schema serves every events-table pipeline (a superset:
  * userId, eventId, tMs, etype, value); each pipeline projects the
  * columns it needs — the schema-on-read contract a shared ingest
  * topic has in production.
  */
object EventsReplay {

  /** Wire-superset record for one replayed `events` row. */
  final case class Ev(
      userId: Long, eventId: Long, tMs: Long, etype: String, value: Double)

  val Schema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("eventId", LongType),
    StructField("tMs", LongType),
    StructField("etype", StringType),
    StructField("value", DoubleType)))

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Write one gzipped JSONL chunk into `dir` (ordering contract:
    * [[ReplayChunks]]). Doubles are serialized via `Double.toString`
    * (shortest round-tripping form), so `from_json`'s parse is
    * bit-exact.
    */
  def writeChunk(dir: String, i: Int, chunk: Seq[Ev]): Unit =
    ReplayChunks.writeJsonlGz(dir, f"events-$i%05d.jsonl.gz", i,
      chunk.map { e =>
        s"""{"userId":${e.userId},"eventId":${e.eventId},"tMs":${e.tMs},"etype":${jsonStr(e.etype)},"value":${e.value}}"""
      })

  /** Parsed streaming DataFrame over the chunk files in `dir`: columns
    * (userId, eventId, tMs, etype, value, ts), one chunk per
    * micro-batch.
    */
  def openStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(dir)
      .select(from_json(col("value"), Schema).as("j"))
      .select(col("j.userId").as("userId"), col("j.eventId").as("eventId"),
        col("j.tMs").as("tMs"), col("j.etype").as("etype"),
        col("j.value").as("value"))
      .withColumn("ts", timestamp_millis(col("tMs")))

  /** Write `evs` as `nChunks` gz JSONL chunks (+ an optional trailing
    * flush chunk — processed as one more data micro-batch AFTER the
    * last event chunk, applying the watermark that chunk advanced;
    * no-data micro-batches are disabled in the replay sessions, see
    * StreamingQueries.streamSession) and return the parsed streaming
    * DataFrame + the chunk dir the caller must delete after the query
    * stops.
    */
  /** The ONE spelling of the feed→chunk assignment: chunk i IS
    * micro-batch i (mod-time ordering via [[ReplayChunks]] +
    * `maxFilesPerTrigger=1`). Exposed so specs that reason about a
    * specific micro-batch's contents (e.g. state time travel to
    * batchId 0) use THIS assignment instead of re-deriving the
    * ceil-division — keeping the convention changeable in one place.
    */
  def chunks(evs: Seq[Ev], nChunks: Int): Vector[Seq[Ev]] = {
    val chunkSize = math.max(1, math.ceil(evs.size.toDouble / nChunks).toInt)
    evs.grouped(chunkSize).toVector
  }

  def fileStream(
      spark: SparkSession,
      evs: Seq[Ev],
      nChunks: Int,
      flushChunk: Seq[Ev] = Nil): (DataFrame, String) = {
    val dir = TempDir.create("graft-events-")
    val dataChunks = chunks(evs, nChunks)
    dataChunks.zipWithIndex.foreach { case (chunk, i) =>
      writeChunk(dir.toString, i, chunk)
    }
    if (flushChunk.nonEmpty) writeChunk(dir.toString, dataChunks.size, flushChunk)
    (openStream(spark, dir.toString), dir.toString)
  }
}
