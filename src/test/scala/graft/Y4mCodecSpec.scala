package graft

import graft.multimodal.Multimodal.Y4mCodec
import org.scalatest.funsuite.AnyFunSuite

/** The real YUV4MPEG2 codec, off-Spark: tagged-parameter header parse,
  * encode/decode roundtrip, the FRAME-marker walk (with per-frame
  * params and non-mono colorspace plane math), and the malformed-input
  * failures a real decoder must produce.
  */
class Y4mCodecSpec extends AnyFunSuite {

  test("encode → decodeVideo roundtrip over assorted shapes") {
    for ((w, h, nf) <- Seq((1, 1, 1), (8, 2, 3), (16, 2, 1), (23, 2, 7))) {
      val frames = (0 until nf).map(f =>
        Array.tabulate(w * h)(i => ((f * 31 + i) % 251).toByte))
      val enc = Y4mCodec.encode(frames, w, h)
      val info = Y4mCodec.decodeVideo(enc)
      assert((info.width, info.height, info.fpsNum, info.fpsDen, info.nFrames) ==
        ((w, h, 25, 1, nf)))
      val all = Y4mCodec.sampleFrames(enc, 1)
      assert(all.map(_._1) == (0 until nf))
      all.foreach { case (i, f) => assert(f.toSeq == frames(i).toSeq) }
      // stride 2 keeps even indices only
      assert(Y4mCodec.sampleFrames(enc, 2).map(_._1) == (0 until nf by 2))
    }
  }

  test("header scan handles unused tags and per-frame params") {
    // interlace/aspect/extension tags are valid noise; FRAME lines may
    // carry parameters the walk must skip to the newline
    val raw = ("YUV4MPEG2 W3 H2 F30000:1001 Ip A1:1 Cmono Xgraft\n" +
      "FRAME Ixyz\n" + "abcdef" + "FRAME\n" + "ghijkl")
      .getBytes("US-ASCII")
    val info = Y4mCodec.decodeVideo(raw)
    assert((info.width, info.height, info.fpsNum, info.fpsDen, info.nFrames) ==
      ((3, 2, 30000, 1001, 2)))
    val frames = Y4mCodec.sampleFrames(raw, 1)
    assert(frames.map(f => new String(f._2, "US-ASCII")) == Seq("abcdef", "ghijkl"))
  }

  test("non-mono colorspaces size their chroma planes (420/422/444)") {
    def stream(cs: String, frameBytes: Int): Array[Byte] =
      (s"YUV4MPEG2 W4 H2 C$cs\n" + "FRAME\n" + "x" * frameBytes).getBytes("US-ASCII")
    assert(Y4mCodec.decodeVideo(stream("420", 12)).nFrames == 1) // 8 luma + 2×2 chroma
    assert(Y4mCodec.decodeVideo(stream("422", 16)).nFrames == 1)
    assert(Y4mCodec.decodeVideo(stream("444", 24)).nFrames == 1)
    // default colorspace when no C tag is 420
    val noTag = ("YUV4MPEG2 W4 H2\n" + "FRAME\n" + "x" * 12).getBytes("US-ASCII")
    assert(Y4mCodec.decodeVideo(noTag).nFrames == 1)
  }

  test("malformed inputs are rejected, not misread") {
    val ok = Y4mCodec.encode(Seq(Array.fill(6)(1.toByte)), 3, 2)
    intercept[IllegalArgumentException](
      Y4mCodec.decodeHeader("YUV4MPEG1 W3 H2\nFRAME\nabcdef".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](Y4mCodec.decodeVideo(ok.dropRight(1))) // truncated frame
    intercept[IllegalArgumentException](Y4mCodec.decodeHeader(Array[Byte]()))
    intercept[IllegalArgumentException](Y4mCodec.decodeHeader(
      "YUV4MPEG2 W3 H2".getBytes("US-ASCII"))) // unterminated header
    // garbage between frames: the walk requires a FRAME marker
    val garbage = ok ++ "JUNK!!".getBytes("US-ASCII")
    intercept[IllegalArgumentException](Y4mCodec.decodeVideo(garbage))
    // unsupported colorspace fails at plane math, loudly
    intercept[IllegalArgumentException](Y4mCodec.decodeVideo(
      "YUV4MPEG2 W3 H2 C999\nFRAME\nabcdef".getBytes("US-ASCII")))
  }
}
