package graft

import graft.streaming.{TaxiPipelines, TaxiReplay, RideEvent}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties (SURVEY.md §5.3) over the pure engine math —
  * no Spark session needed, so these run in milliseconds.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val tsGen = Gen.choose(1_500_000_000_000L, 1_800_000_000_000L)

  test("every event lands in exactly windowSize/slide panes, all containing it") {
    check(forAll(tsGen) { t =>
      val ends = TaxiPipelines.windowEndsFor(t)
      val distinct = ends.distinct.size == 3
      val containing = ends.forall(e =>
        t < e && t >= e - TaxiPipelines.WindowSizeMs)
      val aligned = ends.forall(_ % TaxiPipelines.WindowSlideMs == 0)
      distinct && containing && aligned
    })
  }

  test("bounded gaussian delay is within [0, max] for any max") {
    check(forAll(Gen.choose(0L, 600000L), Gen.long) { (maxDelay, seed) =>
      val rnd = new scala.util.Random(seed)
      val d = TaxiReplay.boundedGaussianDelay(rnd, maxDelay)
      d >= 0 && d <= math.max(maxDelay, 0)
    })
  }

  test("serving order is a permutation with bounded time inversion") {
    val eventGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 50L), tsGen)).map(_.map {
      case (id, t) => RideEvent(id, t, isStart = false, -74.0, 40.7, 1)
    })
    check(forAll(eventGen, Gen.choose(0L, 120000L)) { (events, maxDelay) =>
      val served = TaxiReplay.servingOrder(events, maxDelay)
      val permutation = served.map(e => (e.rideId, e.tMs)).sorted ==
        events.map(e => (e.rideId, e.tMs)).sorted
      // an event can only be overtaken by events ≤ maxDelay younger
      val bounded = served.sliding(2).forall {
        case Seq(a, b) => a.tMs <= b.tMs + maxDelay
        case _ => true
      }
      permutation && bounded
    })
  }

  test("WordNgrams native eval equals the regex-split reference for arbitrary text") {
    import graft.functions.expressions.WordNgrams
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.sql.catalyst.util.ArrayData
    val textGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
      1 -> Gen.oneOf('é', 'ø', '字', '.', ','))).map(_.mkString)
    check(forAll(textGen, Gen.choose(2, 6)) { (text, n) =>
      val expected = text.split("\\s+").filter(_.nonEmpty).toSeq
        .sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
      val got = WordNgrams(Literal.create(text, StringType), n)
        .eval(null).asInstanceOf[ArrayData]
        .toObjectArray(StringType).map(_.toString).toList
      got == expected
    })
  }

  test("trigram packing is injective on printable ascii strings") {
    val ascii = Gen.listOfN(12, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    check(forAll(ascii, ascii) { (a, b) =>
      def pack(s: String): Set[Int] = {
        val bs = s.getBytes("UTF-8")
        if (bs.length == 0) Set(0)
        else (0 until math.max(bs.length - 2, 1)).map { i =>
          def at(j: Int) = if (j < bs.length) bs(j) & 0xff else 0
          at(i) * 65536 + at(i + 1) * 256 + at(i + 2)
        }.toSet
      }
      // equal trigram sets for equal strings; distinct 3-substrings
      // imply distinct packed values (injectivity on the window)
      (a != b) || pack(a) == pack(b)
    })
  }

  test("greedy sequence packing: budget respected, seqs contiguous, packing tight") {
    import graft.queries.TextQueries
    val B = TextQueries.PackBudget
    val rowGen = for {
      bucket <- Gen.choose(0L, 3L)
      n <- Gen.frequency(8 -> Gen.choose(0L, B), 1 -> Gen.choose(B, 2 * B))
    } yield (bucket, n)
    check(forAll(Gen.listOf(rowGen)) { rows =>
      val sorted = rows.zipWithIndex
        .map { case ((b, n), i) => (i.toLong, b, n) }
        .sortBy { case (id, b, _) => (b, id) }
      val packed = TextQueries.packScan(sorted.iterator).toList
      val perm = packed.map { case (id, b, _, n) => (id, b, n) }.toSet ==
        sorted.toSet
      val byBucket = packed.groupBy(_._2)
      byBucket.values.forall { docs =>
        val seqs = docs.map(_._3)
        // seq ids start at 0 and step by at most 1, in doc order
        val contiguous = seqs.headOption.forall(_ == 0L) &&
          seqs.zip(seqs.drop(1)).forall { case (a, c) => c == a || c == a + 1 }
        val groups = docs.groupBy(_._3).toSeq.sortBy(_._1).map(_._2)
        // a sequence exceeds the budget only as a single over-long doc
        val bounded = groups.forall(g =>
          g.map(_._4).sum <= B || g.size == 1)
        // greedy tightness: the doc that opened seq k+1 did not fit in seq k
        val tight = groups.zip(groups.drop(1)).forall { case (prev, next) =>
          prev.map(_._4).sum + next.head._4 > B
        }
        contiguous && bounded && tight
      } && perm
    })
  }

  test("PGM codec: encode→decode roundtrip over arbitrary dims and pixel bytes") {
    import graft.multimodal.Multimodal.PgmCodec
    val gen = for {
      w <- Gen.choose(1, 60)
      h <- Gen.choose(1, 40)
      px <- Gen.containerOfN[Array, Byte](w * h, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, px)
    check(forAll(gen) { case (w, h, px) =>
      val enc = PgmCodec.encode(px, w, h)
      val hd = PgmCodec.decodeHeader(enc)
      hd.width == w && hd.height == h &&
        PgmCodec.pixels(enc).toSeq == px.toSeq
    })
  }

  test("WAV codec: encode→decode roundtrip over arbitrary rates/channels/samples") {
    import graft.multimodal.Multimodal.WavCodec
    val gen = for {
      rate <- Gen.choose(1, 192_000)
      ch <- Gen.choose(1, 8)
      data <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (rate, ch, data)
    check(forAll(gen) { case (rate, ch, data) =>
      val enc = WavCodec.encode(data, rate, ch)
      val a = WavCodec.decodeAudio(enc)
      a.sampleRate == rate && a.channels == ch &&
        a.nFrames == data.length / ch &&
        WavCodec.samples(enc).toSeq == data.toSeq
    })
  }

  test("y4m codec: encode→decode roundtrip over arbitrary dims and frame counts") {
    import graft.multimodal.Multimodal.Y4mCodec
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 8)
      nf <- Gen.choose(0, 6)
      frames <- Gen.listOfN(nf,
        Gen.containerOfN[Array, Byte](w * h, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    } yield (w, h, frames)
    check(forAll(gen) { case (w, h, frames) =>
      val enc = Y4mCodec.encode(frames, w, h)
      val info = Y4mCodec.decodeVideo(enc)
      val out = Y4mCodec.sampleFrames(enc, 1)
      info.width == w && info.height == h && info.nFrames == frames.size &&
        out.map(_._2.toSeq) == frames.map(_.toSeq)
    })
  }

  test("upsert wire codec: encode->decode roundtrip over arbitrary unicode fields") {
    import graft.streaming.ForeachKeyedUpsertWriter
    import org.apache.spark.sql.Row
    // arbitrary strings INCLUDING tabs, newlines, backslashes, the
    // null marker codepoint, and surrogate-safe unicode; None = null
    val fieldGen = Gen.option(Gen.listOf(Gen.oneOf(
      Gen.choose(' ', '~'), Gen.oneOf('\t', '\n', '\\', '\u2400'),
      Gen.choose('\u00a1', '\ud7ff'))).map(_.mkString))
    check(forAll(Gen.nonEmptyListOf(fieldGen), Gen.choose(1, 3)) { (fields, nKeyRaw) =>
      val nKey = math.min(nKeyRaw, fields.size)
      val row = Row.fromSeq(fields.map(_.orNull))
      val line = ForeachKeyedUpsertWriter.encode(row, nKey)
      // the payload is everything after the second REAL tab; escaped
      // fields contain no real tabs, so indexOf arithmetic is exact
      val second = line.indexOf('\t', line.indexOf('\t') + 1)
      val payload = line.substring(second + 1)
      val back = ForeachKeyedUpsertWriter.decodeFields(payload)
      // the full line must stay one record: no raw newline anywhere
      !line.contains('\n') && back == fields.map(_.orNull)
    })
  }
}
