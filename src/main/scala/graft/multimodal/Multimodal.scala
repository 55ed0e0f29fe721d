package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (SURVEY.md §2.2 / driver north star):
  * image/audio/video ride through the engine as opaque `binary`
  * payload columns + typed metadata, processed per-partition in
  * batches.
  *
  * The Spark-side plumbing is real — schema, partition-parallel
  * `mapPartitions` over typed rows, batch shape, deterministic
  * output — while the codec itself is STUBBED (`StubCodecs`): this
  * container has no image/audio libraries, so decode produces a
  * deterministic fake derived from the payload bytes. Swapping in a
  * real decoder (JavaCPP/ffmpeg/ImageIO) changes only `StubCodecs`,
  * none of the dataflow.
  *
  * Scale shape: payloads never pass through a shuffle — metadata is
  * extracted in the scan stage and only the (narrow) metadata columns
  * move. Partition sizing is byte-based (`maxRecordsPerBatch`-like
  * logic belongs in the reader config, not here).
  */
object Multimodal {

  /** A media row: opaque payload + routing metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte])

  final case class ImageMeta(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long)

  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Long)

  /** Deterministic fake codecs — STUBS for the real decoders.
    * Everything derives from payload length/bytes so tests are stable
    * and the oracle can recompute `n_bytes`.
    */
  object StubCodecs {
    /** STUB: a real implementation would parse the image header. */
    def decodeImage(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val width = 16 + (n % 64)
      val height = 16 + ((n / 64) % 64)
      val channels = if (n % 2 == 0) 3 else 1
      (width, height, channels)
    }

    /** STUB: a real implementation would demux + sample frames. */
    def sampleFrames(payload: Array[Byte], everyNth: Int): Seq[(Int, Long)] = {
      val chunk = math.max(1, payload.length / 8) // fake 8-frame video
      (0 until 8 by everyNth).map(i => (i, chunk.toLong))
    }

    /** STUB: a real implementation would rescale pixel data; the fake
      * derives the output payload deterministically (every k-th byte),
      * preserving the real pipeline property that resize shrinks the
      * payload in place of the scan stage.
      */
    def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val target = math.max(1, math.min(payload.length, targetW * targetH / 64))
      val step = math.max(1, payload.length / target)
      payload.indices.by(step).map(payload).toArray
    }

    /** STUB: a real implementation would run a vision/audio encoder;
      * the fake folds payload bytes into a deterministic unit-norm-ish
      * float vector with the real output shape (fixed dim).
      */
    def extractFeatures(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.sqrt(acc.map(x => x * x).sum).toFloat
      if (n == 0f) acc else acc.map(_ / n)
    }

    /** Exact integer twin of `extractFeatures`'s fold (not a stub —
      * integer addition has no rounding): per-lane sums of raw byte
      * values, recomputable bit-exactly by the SQL oracle.
      */
    def byteLaneSums(payload: Array[Byte], dim: Int = 16): Array[Long] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff).toLong
        i += 1
      }
      acc
    }
  }

  final case class ResizedImage(media_id: Long, n_bytes_in: Long, n_bytes_out: Long)

  /** `features` is the stub encoder's unit-norm float vector;
    * `laneSums` is the same byte-fold in *exact integer* domain
    * (laneSums(j) = Σ of payload bytes at positions ≡ j mod dim) — the
    * oracle-checkable shadow of the float fold, so the driver can
    * hard-verify the decode→fold plumbing without comparing float32
    * accumulation against DuckDB doubles.
    */
  final case class MediaFeatures(
      media_id: Long,
      features: Array[Float],
      laneSums: Array[Long])

  /** Resize stage: payload → smaller payload, still partition-local. */
  def resizeImages(media: DataFrame, w: Int = 64, h: Int = 64): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaItem]
      .mapPartitions { it =>
        it.map { m =>
          val out = StubCodecs.resize(m.payload, w, h)
          ResizedImage(m.media_id, m.payload.length.toLong, out.length.toLong)
        }
      }
  }

  /** Feature-extraction stage: payload → fixed-dim embedding, feeding
    * the similarity operators (VectorFunctions/knn) downstream.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem]
      .mapPartitions(_.map(m =>
        MediaFeatures(m.media_id,
          StubCodecs.extractFeatures(m.payload, dim),
          StubCodecs.byteLaneSums(m.payload, dim))))
  }

  /** Synthesizes a media table from `documents` (no binary test table
    * ships with the driver): payload = utf8 bytes of the text, kind
    * assigned round-robin. Deterministic on both engines.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Image-decode stage: partition-parallel, typed, no shuffle. */
  def decodeImages(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaItem]
      .mapPartitions { it =>
        it.map { m =>
          val (w, h, c) = StubCodecs.decodeImage(m.payload)
          ImageMeta(m.media_id, w, h, c, m.payload.length.toLong)
        }
      }
  }

  /** Video frame-sampling stage: 1→N expansion per partition. */
  def sampleVideoFrames(media: DataFrame, everyNth: Int = 2): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaItem]
      .mapPartitions { it =>
        it.flatMap { m =>
          StubCodecs.sampleFrames(m.payload, everyNth).map { case (i, b) =>
            FrameSample(m.media_id, i, b)
          }
        }
      }
  }
}
