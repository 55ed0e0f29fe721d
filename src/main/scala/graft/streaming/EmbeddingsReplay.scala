package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-based streaming ingress for the `embeddings` table — the
  * vector-store twin of [[EventsReplay]]/[[DocsReplay]]: delta
  * vectors arrive as gz JSONL chunk drops (vec_id + the float array)
  * consumed by `readStream.text` + `from_json`, one chunk per
  * micro-batch. Floats serialize via `Float.toString` (shortest
  * round-tripping form), so the parse back to FloatType is bit-exact
  * — the property the PQ encoder's determinism rides on.
  */
object EmbeddingsReplay {

  val Schema: StructType = StructType(Seq(
    StructField("vecId", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def writeChunk(dir: String, i: Int, chunk: Seq[(Long, Array[Float])]): Unit =
    ReplayChunks.writeJsonlGz(dir, f"vecs-$i%05d.jsonl.gz", i,
      chunk.map { case (id, e) =>
        s"""{"vecId":$id,"embedding":[${e.mkString(",")}]}"""
      })

  /** Write `vecs` as `nChunks` gz JSONL chunks and return the parsed
    * streaming DataFrame (vec_id, embedding) + the chunk dir the
    * caller must delete after the query stops.
    */
  def fileStream(
      spark: SparkSession,
      vecs: Seq[(Long, Array[Float])],
      nChunks: Int): (DataFrame, String) = {
    val dir = TempDir.create("graft-vecs-")
    val chunkSize = math.max(1, math.ceil(vecs.size.toDouble / nChunks).toInt)
    vecs.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
      writeChunk(dir.toString, i, chunk)
    }
    val parsed = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(dir.toString)
      .select(from_json(col("value"), Schema).as("j"))
      .select(col("j.vecId").as("vec_id"), col("j.embedding").as("embedding"))
    (parsed, dir.toString)
  }
}
