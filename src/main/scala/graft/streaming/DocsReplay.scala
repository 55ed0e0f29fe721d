package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-based streaming ingress for the documents corpus — the LLM
  * pipeline's front door in its production shape: docs arrive as
  * gzipped JSONL chunk files (the wire format of every large corpus
  * drop — one JSON object per line, gz per chunk), consumed by
  * `readStream.text` + `from_json` with `maxFilesPerTrigger = 1`, one
  * chunk per micro-batch. The MemoryStream variant
  * (`docs_ingest_stream`) is the low-latency harness; this is the
  * object-store-listing path a 100 TB ingest actually runs — text
  * never touches the driver once the fixture chunks are on disk
  * (chunk WRITING is test harness, exactly like
  * [[TaxiReplay.fileStream]]'s CSV chunks).
  */
object DocsReplay {

  val Schema: StructType = StructType(Seq(
    StructField("docId", LongType),
    StructField("tMs", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** Minimal JSON string escape: quote, backslash, control chars —
    * everything `from_json` needs to round-trip arbitrary fixture
    * text.
    */
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

  /** Write one gzipped JSONL chunk file into `dir`. Mod times are
    * stamped strictly increasing by chunk index so FileStreamSource's
    * mod-time ordering replays chunks in feed order (same trap as
    * [[TaxiReplay.fileStream]]); a chunk written AFTER a query started
    * (or after a restart) is picked up by the next file listing — the
    * arrival path `StreamRecoverySpec` drives.
    */
  def writeChunk(dir: String, i: Int, chunk: Seq[DocEvent]): Unit =
    ReplayChunks.writeJsonlGz(dir, f"docs-$i%05d.jsonl.gz", i,
      chunk.map { d =>
        s"""{"docId":${d.docId},"tMs":${d.tMs},"text":${jsonStr(d.text)},"source":${jsonStr(d.source)}}"""
      })

  /** Parsed streaming DataFrame over the chunk files in `dir`, one
    * chunk per micro-batch.
    */
  def openStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(dir)
      .select(from_json(col("value"), Schema).as("j"))
      .select(col("j.docId").as("docId"), col("j.tMs").as("tMs"),
        col("j.text").as("text"), col("j.source").as("source"))
      .withColumn("ts", timestamp_millis(col("tMs")))

  /** Write `docs` as `nChunks` gzipped JSONL chunk files and return a
    * parsed streaming DataFrame over them (+ the chunk dir the caller
    * must delete after the query stops).
    */
  def fileStream(
      spark: SparkSession,
      docs: Seq[DocEvent],
      nChunks: Int): (DataFrame, String) = {
    val dir = TempDir.create("graft-docs-")
    val chunkSize = math.max(1, math.ceil(docs.size.toDouble / nChunks).toInt)
    docs.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
      writeChunk(dir.toString, i, chunk)
    }
    (openStream(spark, dir.toString), dir.toString)
  }
}
