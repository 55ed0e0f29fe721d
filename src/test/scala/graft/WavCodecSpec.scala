package graft

import graft.multimodal.Multimodal.WavCodec
import org.scalatest.funsuite.AnyFunSuite

/** The real RIFF/WAV codec, off-Spark: little-endian header fields,
  * encode/decode roundtrip, the even-padded chunk walk (unknown chunks
  * before `data` must be skipped, not misread as samples), and the
  * malformed-input failures a real decoder must produce.
  */
class WavCodecSpec extends AnyFunSuite {

  test("encode → decodeHeader roundtrip over assorted shapes") {
    for ((n, rate, ch) <- Seq((0, 8000, 1), (1, 12000, 2), (7, 16000, 1),
        (256, 20000, 2), (1000, 44100, 2))) {
      val data = Array.tabulate(n)(i => (i % 253).toByte)
      val enc = WavCodec.encode(data, rate, ch)
      assert(enc.length == 44 + n)
      val hd = WavCodec.decodeHeader(enc)
      assert((hd.sampleRate, hd.channels, hd.bitsPerSample, hd.dataSize) ==
        ((rate, ch, 8, n)))
      assert(WavCodec.samples(enc).toSeq == data.toSeq)
      val a = WavCodec.decodeAudio(enc)
      assert(a.nFrames == n / ch)
    }
  }

  test("chunk walk skips unknown chunks (incl. odd-size even-padding)") {
    val data = Array[Byte](10, 20, 30, 40)
    val enc = WavCodec.encode(data, 8000, 1)
    // splice a 5-byte LIST chunk (odd → 1 pad byte) between fmt and data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "hello".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = enc.take(36) ++ listChunk ++ enc.drop(36)
    // patch the RIFF size for the inserted 14 bytes (LE u32 at offset 4)
    val riffSize = 36 + data.length + listChunk.length
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val hd = WavCodec.decodeHeader(spliced)
    assert((hd.sampleRate, hd.channels, hd.dataSize) == ((8000, 1, 4)))
    assert(WavCodec.samples(spliced).toSeq == data.toSeq)
  }

  test("byte values >= 0x80 survive the roundtrip (binary, not UTF-8)") {
    val data = Array.tabulate(256)(i => i.toByte) // all byte values
    val enc = WavCodec.encode(data, 16000, 1)
    assert(WavCodec.samples(enc).toSeq == data.toSeq)
    assert(WavCodec.samples(enc).foldLeft(0L)((s, b) => s + (b & 0xff)) ==
      (0 until 256).sum)
  }

  test("malformed inputs are rejected, not misread") {
    val ok = WavCodec.encode(Array[Byte](1, 2, 3, 4), 8000, 1)
    intercept[IllegalArgumentException](
      WavCodec.decodeHeader("RIFX0000WAVE".getBytes("US-ASCII"))) // bad magic
    intercept[IllegalArgumentException](
      WavCodec.decodeHeader(ok.dropRight(1))) // truncated data chunk
    intercept[IllegalArgumentException](WavCodec.decodeHeader(Array[Byte]()))
    // non-PCM format code (2 = ADPCM) in the fmt chunk
    val adpcm = ok.clone(); adpcm(20) = 2
    intercept[IllegalArgumentException](WavCodec.decodeHeader(adpcm))
    // fmt chunk missing entirely: RIFF + bare data chunk
    val noFmt = "RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "data".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    intercept[IllegalArgumentException](WavCodec.decodeHeader(noFmt))
  }
}
