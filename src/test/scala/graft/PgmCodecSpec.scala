package graft

import graft.multimodal.Multimodal.PgmCodec
import org.scalatest.funsuite.AnyFunSuite

/** The real P5 PGM codec, off-Spark: header parse (including the
  * comment/whitespace tolerance the Netpbm spec allows), encode/decode
  * roundtrip, nearest-neighbor resize arithmetic, and the malformed-
  * input failures a real decoder must produce.
  */
class PgmCodecSpec extends AnyFunSuite {

  test("encode → decodeHeader roundtrip over assorted dims") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 1), (47, 12), (100, 3))) {
      val px = Array.tabulate(w * h)(i => (i % 251).toByte)
      val enc = PgmCodec.encode(px, w, h)
      val hd = PgmCodec.decodeHeader(enc)
      assert((hd.width, hd.height, hd.maxVal) == ((w, h, 255)))
      assert(PgmCodec.pixels(enc).toSeq == px.toSeq)
      assert(PgmCodec.decodeImage(enc) == ((w, h, 1)))
    }
  }

  test("header scan tolerates comments and mixed whitespace") {
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val raw = "P5 # a comment\n # another\n\t3\r\n2 \n255\n"
      .getBytes("US-ASCII") ++ px
    val hd = PgmCodec.decodeHeader(raw)
    assert((hd.width, hd.height, hd.maxVal) == ((3, 2, 255)))
    assert(PgmCodec.pixels(raw).toSeq == px.toSeq)
  }

  test("nearest-neighbor resize samples (x*w/tw, y*h/th)") {
    // 2x2 image [[1,2],[3,4]] upscaled to 4x4: each source pixel
    // becomes a 2x2 block; downscaled to 1x1: top-left sample
    val enc = PgmCodec.encode(Array[Byte](1, 2, 3, 4), 2, 2)
    val up = PgmCodec.resize(enc, 4, 4)
    assert(PgmCodec.pixels(up).toSeq ==
      Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
    val down = PgmCodec.resize(enc, 1, 1)
    assert(PgmCodec.pixels(down).toSeq == Seq[Byte](1))
    assert(PgmCodec.decodeImage(down) == ((1, 1, 1)))
  }

  test("malformed inputs are rejected, not misread") {
    val ok = PgmCodec.encode(Array[Byte](1, 2, 3, 4), 2, 2)
    intercept[IllegalArgumentException](PgmCodec.decodeHeader("P6\n1 1\n255\nX".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](PgmCodec.decodeHeader(ok.dropRight(1))) // truncated pixels
    intercept[IllegalArgumentException](PgmCodec.decodeHeader("P5\n2 2\n999\nabcd".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](PgmCodec.decodeHeader(Array[Byte]()))
  }
}
