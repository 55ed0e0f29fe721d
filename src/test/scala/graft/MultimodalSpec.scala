package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing: binary payloads flow partition-parallel
  * through the typed decode/sample stages; stub codecs are
  * deterministic functions of the payload bytes.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("media table routes kinds and keeps payloads byte-exact") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    assert(media.select(col("kind")).distinct().count() == 3)
    // payload round-trips: decode utf8 back to the source text
    val mismatch = media
      .join(Tables.documents(spark, sf), col("media_id") === col("doc_id"))
      .filter(decode(col("payload"), "UTF-8") =!= col("text"))
      .count()
    assert(mismatch == 0)
  }

  test("image decode is partition-parallel and deterministic") {
    val media = Multimodal.mediaFromDocuments(spark, sf).repartition(8)
    val metas = Multimodal.decodeImages(media).collect()
    assert(metas.nonEmpty)
    assert(metas.forall(m => m.width >= 16 && m.width < 80))
    assert(metas.forall(m => m.channels == 3 || m.channels == 1))
    // rerun yields identical rows (stub codec is a pure function)
    val again = Multimodal.decodeImages(media).collect()
    assert(metas.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("resize shrinks payloads deterministically") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val resized = Multimodal.resizeImages(media).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.n_bytes_out <= r.n_bytes_in && r.n_bytes_out > 0))
  }

  test("feature extraction yields fixed-dim unit vectors feeding knn") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
    assert(feats.filter(size(col("features")) =!= 16).count() == 0)
    // norms ≈ 1 → usable directly by the cosine/knn operators
    val norms = feats.select(
      graft.functions.VectorFunctions.norm(col("features")).as("n"))
    assert(norms.filter(abs(col("n") - 1.0) > 1e-5).count() == 0)
  }

  test("video frame sampling expands 1→N with the sampling stride") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val nVideos = media.filter(col("kind") === "video").count()
    val frames = Multimodal.sampleVideoFrames(media, everyNth = 2)
    assert(frames.count() == nVideos * 4) // 8 fake frames, stride 2
    val strides = frames.select(countDistinct(col("frame_idx"))).head().getLong(0)
    assert(strides == 4)
  }
}
