package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing: binary payloads flow partition-parallel
  * through the typed decode/sample stages; features are real classical
  * signal processing over really-decoded content bytes.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("media table routes kinds; audio raw, image = real PGM, video = real y4m") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    assert(media.select(col("kind")).distinct().count() == 3)
    // audio payload round-trips: decode utf8 back to the source text
    // (the real-WAV twin is audioFromDocuments, tested below)
    val mismatch = media
      .join(Tables.documents(spark, sf), col("media_id") === col("doc_id"))
      .filter(col("kind") === "audio")
      .filter(decode(col("payload"), "UTF-8") =!= col("text"))
      .count()
    assert(mismatch == 0)
    // image payloads are genuine P5 PGM whose pixel bytes start with
    // the source text (space-padded to fill the last row)
    val imgs = media
      .join(Tables.documents(spark, sf), col("media_id") === col("doc_id"))
      .filter(col("kind") === "image")
      .select(col("payload"), col("text"))
      .collect()
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val payload = r.getAs[Array[Byte]](0)
      val text = r.getString(1)
      val px = new String(Multimodal.PgmCodec.pixels(payload), "UTF-8")
      assert(px.startsWith(text))
      assert(px.drop(text.length).forall(_ == ' '))
    }
    // video payloads are genuine YUV4MPEG2 whose concatenated luma
    // planes start with the source text (space-padded last frame)
    val vids = media
      .join(Tables.documents(spark, sf), col("media_id") === col("doc_id"))
      .filter(col("kind") === "video")
      .select(col("payload"), col("text"))
      .collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val payload = r.getAs[Array[Byte]](0)
      val text = r.getString(1)
      val info = Multimodal.Y4mCodec.decodeVideo(payload)
      assert(info.height == 2 && info.fpsNum == 25)
      val luma = Multimodal.Y4mCodec.sampleFrames(payload, 1)
        .map(f => new String(f._2, "UTF-8")).mkString
      assert(luma.length == info.width * 2 * info.nFrames)
      assert(luma.startsWith(text))
      assert(luma.drop(text.length).forall(_ == ' '))
    }
  }

  test("image decode parses the real PGM header, partition-parallel") {
    val media = Multimodal.mediaFromDocuments(spark, sf).repartition(8)
    val metas = Multimodal.decodeImages(media).collect()
    assert(metas.nonEmpty)
    // fixture math: w = 16 + len % 32, h = ceil(len / w) >= 1
    assert(metas.forall(m => m.width >= 16 && m.width < 48))
    assert(metas.forall(_.channels == 1))
    metas.foreach { m =>
      val pixelBytes = m.width.toLong * m.height
      // n_bytes = header + pixels exactly (parsed, not derived)
      assert(m.n_bytes ==
        3 + m.width.toString.length + 1 + m.height.toString.length + 5 + pixelBytes)
    }
    // rerun yields identical rows (pure decode)
    val again = Multimodal.decodeImages(media).collect()
    assert(metas.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("resize emits fixed-dims PGM; pix_sum matches a driver-side re-walk") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val resized = Multimodal.resizeImages(media).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.n_bytes_out == 13 + 64 * 64)) // "P5\n64 64\n255\n" + samples
    val byId = media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    resized.foreach { r =>
      val out = Multimodal.PgmCodec.resize(byId(r.media_id), 64, 64)
      val want = Multimodal.PgmCodec.pixels(out).foldLeft(0L)((a, b) => a + (b & 0xff))
      assert(r.pix_sum == want)
    }
  }

  test("wavPayload column arithmetic emits the bytes WavCodec.encode would") {
    val audio = Multimodal.audioFromDocuments(spark, sf)
      .join(Tables.documents(spark, sf), col("media_id") === col("doc_id"))
      .select(col("media_id"), col("payload"), col("text"))
      .collect()
    assert(audio.nonEmpty)
    audio.foreach { r =>
      val id = r.getLong(0)
      val payload = r.getAs[Array[Byte]](1)
      val text = r.getString(2)
      val rate = (8000 + (id % 4) * 4000).toInt
      val ch = (1 + id % 2).toInt
      if (id % 5 == 0) {
        // LIST-bearing rows: canonical encode can't produce them —
        // verify decoded fields + samples instead (the chunk walk)
        val hd = Multimodal.WavCodec.decodeHeader(payload)
        assert((hd.sampleRate, hd.channels, hd.dataOffset) == ((rate, ch, 60)))
        assert(new String(Multimodal.WavCodec.samples(payload), "UTF-8") == text)
      } else {
        // byte-for-byte: the column-arithmetic encoder IS the codec
        val want = Multimodal.WavCodec.encode(text.getBytes("UTF-8"), rate, ch)
        assert(payload.toSeq == want.toSeq, s"payload bytes differ for doc $id")
      }
    }
  }

  test("audio decode parses the real WAV header, partition-parallel") {
    val audio = Multimodal.audioFromDocuments(spark, sf).repartition(8)
    val metas = Multimodal.decodeAudio(audio).collect()
    assert(metas.nonEmpty)
    assert(metas.forall(_.bits_per_sample == 8))
    assert(metas.forall(m => Set(8000, 12000, 16000, 20000)(m.sample_rate)))
    metas.foreach { m =>
      assert(m.duration_us == m.n_frames * 1000000L / m.sample_rate)
    }
    val again = Multimodal.decodeAudio(audio).collect()
    assert(metas.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("feature extraction yields fixed-dim unit vectors feeding knn") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(media).toDF()
    assert(feats.filter(size(col("features")) =!= 16).count() == 0)
    assert(feats.filter(size(col("grid")) =!= 16).count() == 0)
    // norms ≈ 1 → usable directly by the cosine/knn operators
    val norms = feats.select(
      graft.functions.VectorFunctions.norm(col("features")).as("n"))
    assert(norms.filter(abs(col("n") - 1.0) > 1e-5).count() == 0)
  }

  test("pooled grid is layout-aware, partition-exact, and cell-mean correct") {
    import Multimodal.ContentFeatures
    // 8×8 plane with 4 distinct quadrant values: each 2×2-cell block of
    // the 4×4 pool must report its quadrant's exact value
    val quad = Array.tabulate(8 * 8) { i =>
      val y = i / 8; val x = i % 8
      (if (y < 4) (if (x < 4) 10 else 20) else (if (x < 4) 30 else 40)).toByte
    }
    val g = ContentFeatures.pooledGrid(quad, 8, 8)
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val want = if (gy < 2) (if (gx < 2) 10 else 20) else (if (gx < 2) 30 else 40)
      assert(g(gy * 4 + gx) == want, s"cell ($gy,$gx)")
    }
    // a histogram can't tell the quadrant image from its transpose;
    // the pooled grid must (layout awareness — the encoder's point)
    val trans = Array.tabulate(8 * 8)(i => quad((i % 8) * 8 + i / 8))
    assert(ContentFeatures.intensityHistogram(quad).toSeq ==
      ContentFeatures.intensityHistogram(trans).toSeq)
    assert(ContentFeatures.pooledGrid(trans, 8, 8).toSeq != g.toSeq)
    // uneven dims: every pixel counted exactly once, floor-mean per cell
    val odd = Array.tabulate(5 * 3)(i => (i * 7 % 256).toByte)
    val g2 = ContentFeatures.pooledGrid(odd, 5, 3)
    val expect = {
      val sums = new Array[Long](16); val cnts = new Array[Long](16)
      for (i <- 0 until 15) {
        val c = ((i / 5) * 4 / 3) * 4 + ((i % 5) * 4 / 5)
        sums(c) += odd(i) & 0xff; cnts(c) += 1
      }
      (0 until 16).map(c => if (cnts(c) == 0) 0L else sums(c) / cnts(c))
    }
    assert(g2.toSeq == expect)
    assert(ContentFeatures.pooledGrid(Array.empty[Byte], 4, 4).forall(_ == 0L))
    // 1-D pool: 16 equal segments of a 32-byte ramp → segment means
    val ramp = Array.tabulate(32)(i => (i * 8).toByte)
    val s = ContentFeatures.pooledSeq(ramp)
    assert(s.toSeq == (0 until 16).map(g => (g * 16 + 4).toLong))
    // n < bins leaves trailing segments empty (0), no crash
    assert(ContentFeatures.pooledSeq("ab".getBytes("US-ASCII")).count(_ != 0L) == 2)
  }

  test("content bytes are decoded content, never container bytes") {
    import Multimodal.ContentFeatures
    val pgm = Multimodal.PgmCodec.encode("abcdefgh".getBytes("US-ASCII"), 4, 2)
    assert(new String(ContentFeatures.contentBytes(pgm), "US-ASCII") == "abcdefgh")
    val wav = Multimodal.WavCodec.encode("xyz".getBytes("US-ASCII"), 8000, 1)
    assert(new String(ContentFeatures.contentBytes(wav), "US-ASCII") == "xyz")
    val y4m = Multimodal.Y4mCodec.encode(
      Seq("abcd".getBytes("US-ASCII"), "efgh".getBytes("US-ASCII")), 2, 2)
    assert(new String(ContentFeatures.contentBytes(y4m), "US-ASCII") == "abcdefgh")
    // raw (no magic) passes through untouched
    assert(new String(ContentFeatures.contentBytes("plain".getBytes), "US-ASCII")
      == "plain")
    // histogram counts every content byte exactly once
    val h = ContentFeatures.intensityHistogram("abcdefgh".getBytes)
    assert(h.sum == 8 && h(6) == 8) // a-h all in bucket 6 (0x61-0x68)
  }

  test("dHash is exactly invariant under integer upscales and flips under inversion") {
    import Multimodal.{ContentFeatures, PgmCodec}
    // a gradient image: dhash bits are all 0 (monotone increasing rows)
    val grad = PgmCodec.encode(
      Array.tabulate(8 * 8)(i => (i % 8 * 30).toByte), 8, 8)
    assert(ContentFeatures.dhashBytes(grad).forall(_ == 0))
    // inverted gradient: the 9-wide resample duplicates column 0
    // (sx = x*8//9 = 0,0,1..7), so bit 0 compares equal pixels and
    // stays 0; bits 1-7 all strictly decrease → 0xfe per row
    val igrad = PgmCodec.encode(
      Array.tabulate(8 * 8)(i => (210 - i % 8 * 30).toByte), 8, 8)
    assert(ContentFeatures.dhashBytes(igrad).forall(_ == 0xfe))
    // floor sampling composes exactly under an integer 2x upscale:
    // dhash(resize(img, 2w, 2h)) == dhash(img) bit for bit
    val docs = Tables.documents(spark, sf).select(col("text")).collect()
    docs.take(20).foreach { r =>
      val t = r.getString(0)
      val w = 16 + t.length % 32
      val h = math.max(1, (t.length + w - 1) / w)
      val img = PgmCodec.encode(
        (t + " " * (w * h - t.length)).getBytes("US-ASCII"), w, h)
      val up = PgmCodec.resize(img, 2 * w, 2 * h)
      assert(ContentFeatures.dhashBytes(up).toSeq ==
        ContentFeatures.dhashBytes(img).toSeq)
    }
  }

  test("audio features: square wave has known mean, energy, crossings, peak") {
    import spark.implicits._
    // 100,150 alternating x50: mean = 125, dev = ±25, zcr = 99, peak 25
    val samples = Array.tabulate(100)(i => (if (i % 2 == 0) 100 else 150).toByte)
    val wav = Multimodal.WavCodec.encode(samples, 8000, 1)
    val media = Seq((1L, "audio", wav)).toDF("media_id", "kind", "payload")
    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.n_samples == 100 && f.sample_mean == 125)
    assert(f.energy == 100L * 25 * 25)
    assert(f.zero_crossings == 99 && f.peak_dev == 25)
  }

  test("motion energy sums |frame diff| per transition; single-frame emits none") {
    import spark.implicits._
    val f0 = Array.fill(8)(100.toByte)
    val f1 = Array.fill(8)(110.toByte) // diff 8*10 = 80
    val f2 = Array.fill(8)(104.toByte) // diff 8*6  = 48
    val vid = Multimodal.Y4mCodec.encode(Seq(f0, f1, f2), 4, 2)
    val single = Multimodal.Y4mCodec.encode(Seq(f0), 4, 2)
    val media = Seq((1L, "video", vid), (2L, "video", single))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.motionEnergy(media).collect()
    assert(rows.length == 1)
    val m = rows.head
    assert(m.media_id == 1L && m.n_transitions == 2)
    assert(m.motion_total == 128 && m.motion_max == 80)
  }

  test("video frame sampling walks real FRAME markers with the sampling stride") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    // expected frame count per video from the fixture math:
    // fs = 2·(8 + len%16), nf = max(1, ⌈len/fs⌉), sampled = ⌈nf/2⌉
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select(col("text")).collect()
      .map { r =>
        val n = r.getString(0).length
        val fs = 2 * (8 + n % 16)
        val nf = math.max(1, (n + fs - 1) / fs)
        (nf + 1) / 2
      }.sum
    val frames = Multimodal.sampleVideoFrames(media, everyNth = 2).collect()
    assert(frames.length == expected)
    assert(frames.forall(_.frame_idx % 2 == 0)) // stride honored
    // frame_bytes is the real Cmono plane size, constant per video
    assert(frames.forall(f => f.frame_bytes >= 16 && f.frame_bytes <= 46))
  }
}
