package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable slice of the multimodal pipeline: every decoded
  * field and every content feature (histograms, perceptual hashes,
  * audio energy/ZCR, motion) is recomputable by DuckDB from the same
  * `documents` rows, so the binary plumbing — encode →
  * partition-parallel real decode → featurize → project — is
  * driver-verified end-to-end, header bytes and all.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload metadata: byte length + md5 digest per media row.
    "multimodal_meta" -> ((s, dir) => {
      Multimodal.mediaFromDocuments(s, dir).select(
        col("media_id"), col("kind"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("digest"))
    }),

    // Real PGM decode (header parse + pixel walk) through the typed
    // mapPartitions stage; the oracle rebuilds the bytes.
    "multimodal_image_meta" -> ((s, dir) =>
      Multimodal.decodeImages(Multimodal.mediaFromDocuments(s, dir)).toDF()),

    // Real YUV4MPEG2 frame sampling (1→N expansion): Y4mCodec walks
    // the FRAME markers of genuinely encoded video payloads; the
    // oracle re-derives every sampled frame's bytes and sum from the
    // fixture math.
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleVideoFrames(Multimodal.mediaFromDocuments(s, dir)).toDF()),

    // Real RIFF/WAV decode through the typed mapPartitions stage:
    // audio-kind rows are encoded as genuine WAV bytes (binary LE
    // header, some with a LIST chunk forcing a real chunk walk) and
    // WavCodec parses them back. The oracle recomputes every decoded
    // field from the fixture math — green means the header the
    // encoder wrote is the header the decoder read, same standard as
    // multimodal_image_meta's PGM check; sample_sum pins the
    // data-chunk offset the walk found.
    "multimodal_audio_meta" -> ((s, dir) =>
      Multimodal.decodeAudio(Multimodal.audioFromDocuments(s, dir)).toDF()),

    // ×2 decimation with pair averaging over the real RIFF walk; the
    // weighted output checksum pins order AND values (the augment
    // rule).
    "multimodal_audio_resample" -> ((s, dir) =>
      Multimodal.resampleAudio(Multimodal.audioFromDocuments(s, dir)).toDF()),

    // Real resize + feature-extraction stages. Features are pooled
    // grids over DECODED content bytes (4×4 spatial average pool on
    // image luma, 16-segment 1-D pool on PCM/luma/text — never
    // container bytes), with the intensity histogram kept as the
    // fallback column; the float32 unit-norm vector isn't robustly
    // SQL-comparable, but its exact integer twin (the cell values)
    // is — all 16 cells + 16 buckets projected so the driver
    // hard-checks the decode→pool plumbing cell by cell.
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.resizeImages(Multimodal.mediaFromDocuments(s, dir)).toDF()),

    // Geometric augmentation (flip + rot90) over the real decode; the
    // position-weighted checksums pin the exact pixel permutation
    // (a plain sum is permutation-blind). The oracle re-derives both
    // permutations with index arithmetic over the fixture pixel grid.
    "multimodal_augment" -> ((s, dir) =>
      Multimodal.augmentImages(Multimodal.mediaFromDocuments(s, dir)).toDF()),
    "multimodal_features" -> ((s, dir) => {
      val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir)).toDF()
      val head = Seq(col("media_id"),
        org.apache.spark.sql.functions.size(col("features")).as("dim"),
        org.apache.spark.sql.functions.round(
          graft.functions.VectorFunctions.norm(col("features")), 3).as("nrm"))
      val cells = (0 until 16).map(b => element_at(col("grid"), b + 1).as(s"g$b"))
      val buckets = (0 until 16).map(b => element_at(col("hist"), b + 1).as(s"h$b"))
      f.select(head ++ cells ++ buckets: _*)
    }),

    // Perceptual hashes over the real codec resize: dHash (gradient
    // signs on the 9×8 thumbnail) + aHash (above/below the 8×8 mean).
    // The oracle re-walks the exact nearest-neighbor sampling
    // arithmetic, so green pins the real resize + bit packing.
    "multimodal_phash" -> ((s, dir) =>
      Multimodal.perceptualHashes(Multimodal.mediaFromDocuments(s, dir)).toDF()),

    // DC-removed audio features through the real RIFF chunk walk:
    // integer mean, Σdev², mean-crossing count, peak deviation — all
    // exact integers the oracle recomputes from the fixture math.
    "multimodal_audio_features" -> ((s, dir) =>
      Multimodal.audioFeatures(Multimodal.audioFromDocuments(s, dir)).toDF()),

    // Inter-frame motion energy over the real FRAME-marker walk:
    // Σ|luma_t − luma_{t−1}| per transition, aggregated per video.
    "multimodal_motion" -> ((s, dir) =>
      Multimodal.motionEnergy(Multimodal.mediaFromDocuments(s, dir)).toDF()),

    // Perceptual near-dup dedup: every image paired with its 64×64
    // re-encode (different bytes → md5/exact dedup miss it), dHash
    // banded 4×16 bits for LSH candidates (one shuffle on band value,
    // bounded in-bucket expansion — the MinHash-LSH scale shape, never
    // all-pairs), then exact hamming ≤ 8 verified via popcount(xor)
    // on the two 32-bit halves. Rescale invariance of the floor
    // sampling is what makes the thumbnail land near its original.
    "dedup_phash" -> ((s, dir) => {
      val hs = Multimodal.imageDHashWithThumbs(
        Multimodal.mediaFromDocuments(s, dir)).toDF()
      val bands = hs.select(col("media_id"), col("lo"), col("hi"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band_idx", "band_val")))
      val a = bands.as("a")
      val b = bands.as("b")
      a.join(b,
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          (bit_count(col("a.lo").bitwiseXOR(col("b.lo"))) +
            bit_count(col("a.hi").bitwiseXOR(col("b.hi")))).cast("int").as("hamming"))
        .filter(col("hamming") <= 8)
        .distinct()
    }),

    // The composed training-data pipeline: media → partition-parallel
    // feature extraction → cosine top-k (decode → featurize → ANN) as
    // ONE dataflow — payloads never shuffle (features are extracted in
    // the scan stage), and the ANN stage reuses knn_brute's anatomy
    // (broadcast queries, bounded TopKByScore aggregator: Q×k×
    // partitions rows cross the shuffle, not Q×N). Scoring runs in
    // the pooled-grid integer domain — the exact shadow of the float
    // features (same cell values, two domains; see MediaFeatures) —
    // so every dot product is integer-exact and the DuckDB oracle can
    // hash-match the full ranking, not just a rows-only check.
    "multimodal_feature_knn" -> ((s, dir) => {
      import s.implicits._
      val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .select(col("media_id"), col("grid"))
        // products and partial sums stay < 2^53 (cell values are
        // byte-scale), so double accumulation here is EXACT —
        // equality with the oracle's BIGINT arithmetic is bit-level,
        // not approximate
        .withColumn("nrm",
          sqrt(aggregate(col("grid"), lit(0.0), (a, x) => a + x * x)))
      val q = feats.filter(col("media_id") % 50 === 0)
        .select(col("media_id").as("query_id"),
          col("grid").as("q_g"), col("nrm").as("q_nrm"))
      val scored = broadcast(q).join(feats, col("query_id") =!= col("media_id"))
        .select(col("query_id"), col("media_id"),
          (aggregate(zip_with(col("q_g"), col("grid"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) / (col("q_nrm") * col("nrm"))).as("cos"))
        .as[(Long, Long, Double)]
      scored.groupByKey(_._1)
        .mapValues(t => graft.functions.Scored(t._2, t._3))
        .agg(new graft.functions.TopKByScore(FeatureKnnK).toColumn)
        .toDF("query_id", "topk")
        .select(col("query_id"), posexplode(col("topk")))
        .select(col("query_id"), col("col.vec_id").as("neighbor_id"),
          (col("pos") + 1).cast("int").as("rnk"),
          org.apache.spark.sql.functions.round(col("col.cos"), 6).as("cos_r"))
    }),

    // Cross-modal pair mining — the image↔text alignment step a
    // contrastive (CLIP-style) training set is built from: each image
    // is matched to its best caption candidate by feature agreement.
    // Small encoders, REAL plumbing: the image side is the exact
    // integer 4×4 pooled luma grid over the real codec decode
    // (MediaFeatures.grid — layout-aware, what a contrastive
    // encoder's early layers compute), the caption side a 16-bucket
    // token-hash histogram — both exact ints, so the score (integer dot product
    // via zip_with/aggregate, < 2^53 → double accumulation exact) and
    // the argmax are hash-checkable, no float drift. Scale anatomy:
    // candidates pair only WITHIN a source block (the LSH-bucket
    // principle — never corpus all-pairs), payloads never shuffle
    // (features leave the decode stage as 16 ints), and the per-image
    // argmax is a commutative max(struct) — map-side partial, the
    // events_latest_state idiom, never a rank window over the pair
    // relation.
    "multimodal_caption_match" -> ((s, dir) => {
      import graft.functions.TextFunctions.{tokenHash, tokens}
      val docs = graft.Tables.documents(s, dir)
      val media = Multimodal.mediaFromDocuments(s, dir)
      val imgs = Multimodal.extractFeatures(media.filter(col("kind") === "image"))
        .toDF()
        .select(col("media_id"), col("grid"))
        .join(docs.select(col("doc_id").as("media_id"), col("source")), "media_id")
      val caps = docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("caption_id"), col("source"),
          explode(tokens(col("text"))).as("t"))
        .select(col("caption_id"), col("source"),
          pmod(tokenHash(col("t")), lit(16)).as("b"))
        .groupBy(col("caption_id"), col("source"))
        .agg(array((0 until 16).map(b =>
          sum(when(col("b") === b, 1L).otherwise(0L))): _*).as("chist"))
      imgs.join(caps, "source")
        .select(col("media_id"), col("caption_id"),
          aggregate(zip_with(col("grid"), col("chist"), (a, c) => a * c),
            lit(0.0), (acc, x) => acc + x).cast("long").as("score"))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_cands"),
          max(struct(col("score"), (-col("caption_id")).as("negid"))).as("best"))
        .select(col("media_id"), col("n_cands"),
          col("best.score").as("score"),
          (-col("best.negid")).as("caption_id"))
    })
  )

  private val FeatureKnnK = 5

  private val kindSql =
    "(['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)]"

  /** CTE chain rebuilding `mediaFromDocuments`' payload bytes in SQL —
    * image rows as the full PGM byte string (header + text pixels +
    * space padding; Multimodal.pgmPayload is the Spark twin), video
    * rows as the full YUV4MPEG2 stream (header + FRAME-marker-wrapped
    * luma chunks via the same DOTALL regex interleave as
    * Multimodal.y4mPayload), audio as raw text (its real-format twin
    * is the WAV table — binary LE headers can't ride VARCHAR). The
    * corpus is ASCII, so VARCHAR concatenation is byte-identical to
    * the binary payload and `ascii()`/`md5()`/`length()` operate on
    * the same bytes Spark sees.
    */
  private val payloadCte: String =
    s"""pm0 AS (SELECT doc_id, text, $kindSql AS kind,
       |          length(text) AS n, 16 + length(text) % 32 AS w,
       |          (8 + length(text) % 16) * 2 AS fs FROM documents),
       |pm1 AS (SELECT *, greatest(1, (n + w - 1) // w) AS h,
       |          greatest(1, (n + fs - 1) // fs) AS nf FROM pm0),
       |pm AS (SELECT doc_id, kind, text, n, w, h,
       |         CASE WHEN kind = 'image'
       |              THEN 'P5' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR) ||
       |                   chr(10) || '255' || chr(10) || text || repeat(' ', w * h - n)
       |              WHEN kind = 'video'
       |              THEN 'YUV4MPEG2 W' || CAST(fs // 2 AS VARCHAR) || ' H2 F25:1 Cmono' || chr(10) ||
       |                   regexp_replace(text || repeat(' ', fs * nf - n),
       |                     '(?s)(.{' || CAST(fs AS VARCHAR) || '})',
       |                     'FRAME' || chr(10) || '\\1', 'g')
       |              ELSE text END AS payload
       |       FROM pm1)""".stripMargin

  /** CTE rebuilding the DECODED content bytes per kind — the exact
    * byte strings the real codecs hand to the feature stage: image →
    * pixel samples (text space-padded to w·h), video → concatenated
    * luma planes (text space-padded to nf·fs; FRAME markers are
    * container, not content), audio → the raw text bytes.
    */
  private val contentCte: String =
    s"""cm0 AS (SELECT doc_id, text, length(text) AS n, $kindSql AS kind,
       |          16 + length(text) % 32 AS w,
       |          (8 + length(text) % 16) * 2 AS fs FROM documents),
       |cm1 AS (SELECT *, greatest(1, (n + w - 1) // w) AS h,
       |          greatest(1, (n + fs - 1) // fs) AS nf FROM cm0),
       |cm AS (SELECT doc_id, kind, w, h,
       |         CASE WHEN kind = 'image' THEN text || repeat(' ', w * h - n)
       |              WHEN kind = 'video' THEN text || repeat(' ', fs * nf - n)
       |              ELSE text END AS content
       |       FROM cm1)""".stripMargin

  /** Exact bucket-`b` count of the 16-bin intensity histogram over a
    * content expression (ASCII corpus: 1 char = 1 byte and `ascii()`
    * is the byte value — asserted by the length check in the spec).
    */
  private def histSql(b: Int, src: String = "content"): String =
    s"CAST(len([i for i in range(1, length($src) + 1) " +
      s"if ascii(substring($src, i, 1)) // 16 = $b]) AS BIGINT)"

  /** Exact cell `b` (row-major gy·4+gx) of the 4×4 average-pooled
    * luma grid over an image content expression with plane dims
    * (`w`, `h`) — ContentFeatures.pooledGrid's fixture-math twin:
    * pixel (y, x) lands in cell (y·4 ⌊/⌋ h, x·4 ⌊/⌋ w), cell value
    * ⌊Σ/count⌋ with count = ceil-partition width products, empty
    * cells 0.
    */
  private def gridCellSql(b: Int, src: String = "content",
      w: String = "w", h: String = "h"): String = {
    val gy = b / 4
    val gx = b % 4
    val sum = s"coalesce(list_sum([ascii(substring($src, i + 1, 1)) " +
      s"for i in range(0, $w * $h) " +
      s"if ((i // $w) * 4) // $h = $gy and ((i % $w) * 4) // $w = $gx]), 0)"
    val rows = s"(((${gy + 1}) * $h + 3) // 4 - ($gy * $h + 3) // 4)"
    val cols = s"(((${gx + 1}) * $w + 3) // 4 - ($gx * $w + 3) // 4)"
    s"CAST($sum // greatest(1, $rows * $cols) AS BIGINT)"
  }

  /** Exact segment `b` of the 16-segment 1-D average pool over a
    * content expression — ContentFeatures.pooledSeq's twin: byte i
    * lands in segment i·16 ⌊/⌋ n, value ⌊Σ/count⌋, empty segments 0.
    */
  private def seqCellSql(b: Int, src: String = "content"): String = {
    val n = s"length($src)"
    val sum = s"coalesce(list_sum([ascii(substring($src, i + 1, 1)) " +
      s"for i in range(0, $n) if (i * 16) // $n = $b]), 0)"
    val cnt = s"(((${b + 1}) * $n + 15) // 16 - ($b * $n + 15) // 16)"
    s"CAST($sum // greatest(1, $cnt) AS BIGINT)"
  }

  /** Kind-routed pooled-grid cell `b`: spatial 4×4 pool for image
    * rows, 1-D 16-segment pool otherwise.
    */
  private def pooledSql(b: Int, src: String = "content",
      kind: String = "kind"): String =
    s"CASE WHEN $kind = 'image' THEN ${gridCellSql(b, src)} " +
      s"ELSE ${seqCellSql(b, src)} END"

  /** Pixel (y, x) of the ORIGINAL image resized to tw×th — the exact
    * nearest-neighbor arithmetic of PgmCodec.resize: source index
    * (y·h // th)·w + (x·w // tw) into the padded pixel string.
    */
  private def pxO(y: Int, x: Int, tw: Int, th: Int): String =
    s"ascii(substring(padded, (($y*h)//$th)*w + (($x*w)//$tw) + 1, 1))"

  /** Pixel (y, x) of the 64×64 THUMBNAIL resized to tw×th — the same
    * floor sampling composed twice (thumb index first, then the
    * thumb's own source index into the original).
    */
  private def pxT(y: Int, x: Int, tw: Int, th: Int): String = {
    val ty = s"(($y*64)//$th)"
    val tx = s"(($x*64)//$tw)"
    s"ascii(substring(padded, (($ty*h)//64)*w + (($tx*w)//64) + 1, 1))"
  }

  /** dHash row byte y: Σ 2^x over x where p(y,x) > p(y,x+1) on the
    * 9×8 thumbnail (px abstracts original vs thumbnail sampling).
    */
  private def dhashByteSql(px: (Int, Int) => String, y: Int): String =
    (0 until 8).map(x =>
      s"CASE WHEN ${px(y, x)} > ${px(y, x + 1)} THEN ${1 << x} ELSE 0 END")
      .mkString("(", " + ", ")")

  /** The 4×16-bit LSH bands + two LE 32-bit halves of a dHash. */
  private def dhashColsSql(px: (Int, Int) => String): String = {
    def byte(y: Int) = dhashByteSql(px, y)
    val bands = (0 until 4).map(b =>
      s"(${byte(2 * b)} + 256*${byte(2 * b + 1)}) AS band$b").mkString(", ")
    val lo = (0 until 4).map(i => s"CAST(${byte(i)} AS BIGINT)*${1L << (8 * i)}")
      .mkString(" + ")
    val hi = (4 until 8).map(i => s"CAST(${byte(i)} AS BIGINT)*${1L << (8 * (i - 4))}")
      .mkString(" + ")
    s"$bands, ($lo) AS lo, ($hi) AS hi"
  }

  /** The image-pixel CTE shared by the perceptual-hash oracles:
    * (doc_id, w, h, padded) for image-kind rows.
    */
  private val imagePixelCte: String =
    """ph0 AS (SELECT doc_id, text, length(text) AS n,
      |          16 + length(text) % 32 AS w FROM documents WHERE doc_id % 3 = 0),
      |ph1 AS (SELECT *, greatest(1, (n + w - 1) // w) AS h FROM ph0),
      |ph AS (SELECT doc_id, w, h, text || repeat(' ', w * h - n) AS padded
      |       FROM ph1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      // nrm: the normalized pooled-grid vector has unit norm EXCEPT
      // when the grid is all-zero (empty content), norm 0
      // (ContentFeatures.normalized's n == 0 branch). Cells + bucket
      // counts run over the DECODED content bytes rebuilt by
      // contentCte; the inner select materializes the cells so the
      // norm CASE can reference them.
      s"""WITH $contentCte,
         |gr AS (
         |  SELECT doc_id, length(content) AS clen,
         |  ${(0 until 16).map(b => s"${pooledSql(b)} AS g$b").mkString(",\n  ")},
         |  ${(0 until 16).map(b => s"${histSql(b)} AS h$b").mkString(",\n  ")}
         |  FROM cm)
         |SELECT doc_id AS media_id, CAST(16 AS INT) AS dim,
         |  CAST(CASE WHEN ${(0 until 16).map(b => s"g$b = 0").mkString(" AND ")}
         |       THEN 0.0 ELSE 1.0 END AS DOUBLE) AS nrm,
         |  ${(0 until 16).map(b => s"g$b").mkString(", ")},
         |  ${(0 until 16).map(b => s"h$b").mkString(", ")}
         |FROM gr""".stripMargin,

    // Fixture-math twin of ContentFeatures.dhashBytes/ahashBytes over
    // the real resize arithmetic: green means the bit the codec packed
    // is the bit the sampling math predicts, row byte by row byte.
    "multimodal_phash" -> {
      val dhashHex = (0 until 8)
        .map(y => s"printf('%02x', ${dhashByteSql((a, b) => pxO(a, b, 9, 8), y)})").mkString(" || ")
      val meanSql = "(" +
        (for (y <- 0 until 8; x <- 0 until 8) yield pxO(y, x, 8, 8))
          .mkString(" + ") + ") // 64"
      val ahashByte = (y: Int) => (0 until 8).map(x =>
        s"CASE WHEN ${pxO(y, x, 8, 8)} > mean_px THEN ${1 << x} ELSE 0 END")
        .mkString("(", " + ", ")")
      val ahashHex = (0 until 8)
        .map(y => s"printf('%02x', ${ahashByte(y)})").mkString(" || ")
      s"""WITH $imagePixelCte,
         |ph2 AS (SELECT doc_id, w, h, padded, $meanSql AS mean_px FROM ph)
         |SELECT doc_id AS media_id, $dhashHex AS dhash_hex,
         |  $ahashHex AS ahash_hex, CAST(mean_px AS INT) AS mean_px
         |FROM ph2""".stripMargin
    },

    // DC-removed feature math over the WAV data chunk = the text
    // bytes (8-bit PCM fixture): integer mean, Σdev², mean-crossing
    // count, peak |dev| — all exact.
    "multimodal_audio_features" ->
      """WITH a0 AS (SELECT doc_id, length(text) AS n,
        |  [ascii(substring(text, i, 1)) for i in range(1, length(text) + 1)] AS s
        |  FROM documents WHERE doc_id % 3 = 1),
        |a1 AS (SELECT doc_id, n, s, list_sum(s) // n AS m FROM a0 WHERE n > 0)
        |SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(m AS INT) AS sample_mean,
        |  CAST(list_sum([(x - m) * (x - m) for x in s]) AS BIGINT) AS energy,
        |  CAST(len([i for i in range(1, n)
        |    if (s[i] >= m) != (s[i + 1] >= m)]) AS BIGINT) AS zero_crossings,
        |  CAST(list_max([abs(x - m) for x in s]) AS INT) AS peak_dev
        |FROM a1""".stripMargin,

    // Per-transition Σ|luma_t − luma_{t−1}| over the padded frame
    // chunks, aggregated per video; single-frame videos (nf = 1)
    // contribute no rows — mirrored by motionEnergy's length guard.
    "multimodal_motion" ->
      """WITH v0 AS (SELECT doc_id, text, length(text) AS n,
        |    (8 + length(text) % 16) * 2 AS fs
        |  FROM documents WHERE doc_id % 3 = 2),
        |v1 AS (SELECT *, greatest(1, (n + fs - 1) // fs) AS nf FROM v0),
        |v2 AS (SELECT doc_id, fs, nf, text || repeat(' ', fs * nf - n) AS padded
        |       FROM v1),
        |tr AS (SELECT doc_id, t,
        |    list_sum([abs(ascii(substring(padded, t * fs + i, 1))
        |      - ascii(substring(padded, (t - 1) * fs + i, 1)))
        |      for i in range(1, fs + 1)]) AS diff_sum
        |  FROM v2, UNNEST([x for x in range(1, nf)]) AS u(t))
        |SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_transitions,
        |  CAST(sum(diff_sum) AS BIGINT) AS motion_total,
        |  CAST(max(diff_sum) AS BIGINT) AS motion_max
        |FROM tr GROUP BY doc_id""".stripMargin,

    // Band-LSH candidates (originals ∪ 64×64 thumbnails at
    // doc_id + 1000000) verified by exact hamming ≤ 8 on the 64-bit
    // dHash — the same candidate/verify split the Spark plan runs.
    "dedup_phash" ->
      s"""WITH $imagePixelCte,
         |hs AS (
         |  SELECT doc_id AS media_id, ${dhashColsSql((a, b) => pxO(a, b, 9, 8))} FROM ph
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS media_id, ${dhashColsSql((a, b) => pxT(a, b, 9, 8))} FROM ph),
         |cand AS (
         |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         |    CAST(bit_count(xor(a.lo, b.lo))
         |      + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
         |  FROM hs a JOIN hs b ON a.media_id < b.media_id
         |   AND (a.band0 = b.band0 OR a.band1 = b.band1
         |     OR a.band2 = b.band2 OR a.band3 = b.band3))
         |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 8""".stripMargin,
    "multimodal_meta" ->
      s"""WITH $payloadCte
         |SELECT doc_id AS media_id, kind,
         |  CAST(length(payload) AS BIGINT) AS n_bytes,
         |  md5(payload) AS digest
         |FROM pm""".stripMargin,
    // width/height/channels come from Spark PARSING the real P5
    // header; the oracle recomputes them from the fixture math —
    // green means the header the encoder wrote is the header the
    // decoder read. channels = 1 is PGM's definition.
    "multimodal_image_meta" ->
      s"""WITH $payloadCte
         |SELECT doc_id AS media_id,
         |  CAST(w AS INT) AS width,
         |  CAST(h AS INT) AS height,
         |  CAST(1 AS INT) AS channels,
         |  CAST(length(payload) AS BIGINT) AS n_bytes
         |FROM pm WHERE kind = 'image'""".stripMargin,
    // n_bytes_out: "P5\n64 64\n255\n" (13 bytes) + 64·64 samples.
    // pix_sum re-walks the nearest-neighbor sampling over the source
    // pixel string: target (x, y) ← source (x·w // 64, y·h // 64) —
    // the exact arithmetic of PgmCodec.resize, so the oracle pins the
    // real pixel walk, not just the output size.
    "multimodal_augment" ->
      // index arithmetic over the fixture pixel grid: flip reads
      // (y, w−1−x); rot90-CW output pixel i (row length h) reads
      // in(h−1−i%h, i//h)
      s"""WITH $contentCte
         |SELECT cm1.doc_id AS media_id,
         |  CAST(cm1.w AS INT) AS w, CAST(cm1.h AS INT) AS h,
         |  CAST(list_sum([ascii(substring(cm.content, i + 1, 1)) * (i + 1)
         |    for i in range(0, cm1.w * cm1.h)]) AS BIGINT) AS orig_wsum,
         |  CAST(list_sum([ascii(substring(cm.content,
         |    (i // cm1.w) * cm1.w + (cm1.w - 1 - i % cm1.w) + 1, 1)) * (i + 1)
         |    for i in range(0, cm1.w * cm1.h)]) AS BIGINT) AS flip_wsum,
         |  CAST(list_sum([ascii(substring(cm.content,
         |    (cm1.h - 1 - i % cm1.h) * cm1.w + (i // cm1.h) + 1, 1)) * (i + 1)
         |    for i in range(0, cm1.w * cm1.h)]) AS BIGINT) AS rot_wsum
         |FROM cm1 JOIN cm ON cm1.doc_id = cm.doc_id
         |WHERE cm.kind = 'image'""".stripMargin,
    "multimodal_resize" ->
      s"""WITH $payloadCte
         |SELECT doc_id AS media_id,
         |  CAST(length(payload) AS BIGINT) AS n_bytes_in,
         |  CAST(13 + 64 * 64 AS BIGINT) AS n_bytes_out,
         |  CAST(list_sum([ascii(substring(text || repeat(' ', w * h - n),
         |    ((((i // 64) * h) // 64) * w + (((i % 64) * w) // 64)) + 1, 1))
         |    for i in range(0, 64 * 64)]) AS BIGINT) AS pix_sum
         |FROM pm WHERE kind = 'image'""".stripMargin,
    // Fixture-math twin of the WavCodec decode (Multimodal.wavPayload
    // is the Spark-side encoder): rate/channels from doc_id, 8-bit PCM
    // so n_frames = data bytes // channels, duration in exact integer
    // µs, n_bytes = 44-byte canonical header (+16 for the LIST chunk
    // every 5th doc) + data, sample_sum = Σ text byte values (ASCII
    // corpus: 1 char = 1 byte).
    "multimodal_audio_resample" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(length(text) AS BIGINT) AS n_in,
         |  CAST(length(text) // 2 AS BIGINT) AS n_out,
         |  CAST(coalesce(list_sum(
         |    [((ascii(substring(text, 2 * i + 1, 1)) +
         |       ascii(substring(text, 2 * i + 2, 1))) // 2) * (i + 1)
         |     for i in range(0, length(text) // 2)]), 0) AS BIGINT) AS out_wsum
         |FROM documents WHERE doc_id % 3 = 1""".stripMargin,
    "multimodal_audio_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
         |  CAST(1 + doc_id % 2 AS INT) AS channels,
         |  CAST(8 AS INT) AS bits_per_sample,
         |  CAST(length(text) // (1 + doc_id % 2) AS BIGINT) AS n_frames,
         |  CAST((length(text) // (1 + doc_id % 2)) * 1000000
         |       // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_us,
         |  CAST(44 + CASE WHEN doc_id % 5 = 0 THEN 16 ELSE 0 END
         |       + length(text) AS BIGINT) AS n_bytes,
         |  CAST(coalesce(list_sum([ascii(substring(text, i, 1))
         |    for i in range(1, length(text) + 1)]), 0) AS BIGINT) AS sample_sum
         |FROM documents WHERE doc_id % 3 = 1""".stripMargin,
    // Real y4m frame walk: frame f's luma bytes are padded-text chunk
    // [f·fs, (f+1)·fs); the sampled indices are every 2nd frame of a
    // per-row variable frame count (UNNEST over a filtered range), and
    // frame_sum re-adds each sampled chunk's byte values — pinning the
    // marker-walk offsets Y4mCodec computed, not just the count.
    "multimodal_frames" ->
      s"""WITH v0 AS (SELECT doc_id, text, length(text) AS n,
         |              (8 + length(text) % 16) * 2 AS fs
         |            FROM documents WHERE $kindSql = 'video'),
         |v1 AS (SELECT *, greatest(1, (n + fs - 1) // fs) AS nf FROM v0),
         |v2 AS (SELECT doc_id, fs, nf,
         |         text || repeat(' ', fs * nf - n) AS padded FROM v1)
         |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
         |  CAST(fs AS BIGINT) AS frame_bytes,
         |  CAST(coalesce(list_sum([ascii(substring(padded, f * fs + i, 1))
         |    for i in range(1, fs + 1)]), 0) AS BIGINT) AS frame_sum
         |FROM v2, UNNEST([x for x in range(0, nf) if x % 2 = 0]) AS t(f)""".stripMargin,
    "multimodal_feature_knn" -> {
      val buckets = (0 until 16).map(b => s"${pooledSql(b)} AS s$b").mkString(",\n  ")
      def dot(a: String, b: String) =
        (0 until 16).map(l => s"$a.s$l * $b.s$l").mkString(" + ")
      def nrm2(a: String) = (0 until 16).map(l => s"$a.s$l * $a.s$l").mkString(" + ")
      s"""WITH $contentCte,
         |ls AS (
         |  SELECT doc_id AS media_id,
         |  $buckets
         |  FROM cm)
         |SELECT query_id, neighbor_id, rnk, cos_r FROM (
         |  SELECT q.media_id AS query_id, c.media_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.media_id
         |      ORDER BY (${dot("q", "c")}) / (sqrt(${nrm2("q")}) * sqrt(${nrm2("c")})) DESC,
         |               c.media_id ASC) AS rnk,
         |    ROUND((${dot("q", "c")}) / (sqrt(${nrm2("q")}) * sqrt(${nrm2("c")})), 6) AS cos_r
         |  FROM ls q JOIN ls c ON q.media_id % 50 = 0 AND q.media_id != c.media_id
         |) WHERE rnk <= 5""".stripMargin
    },

    // exact-integer mirror: pooled luma grid over decoded content,
    // caption hist over token-hash buckets, argmax via the struct-max
    // idiom
    "multimodal_caption_match" -> {
      val hh = graft.functions.TextFunctions.Sql.tokenHash("t")
      val ih = (0 until 16).map(b => s"${gridCellSql(b)} AS h$b").mkString(",\n  ")
      val ch = (0 until 16).map(b =>
        s"SUM(CASE WHEN $hh % 16 = $b THEN 1 ELSE 0 END) AS c$b").mkString(",\n  ")
      val dot = (0 until 16).map(b => s"ih.h$b * ch.c$b").mkString(" + ")
      s"""WITH $contentCte,
         |ih AS (
         |  SELECT cm.doc_id AS media_id, d.source,
         |  $ih
         |  FROM cm JOIN documents d ON cm.doc_id = d.doc_id
         |  WHERE cm.kind = 'image'),
         |tok AS (SELECT doc_id AS caption_id, source,
         |          unnest(${graft.functions.TextFunctions.Sql.tokens("text")}) AS t
         |        FROM documents WHERE doc_id % 3 = 1),
         |ch AS (
         |  SELECT caption_id, source,
         |  $ch
         |  FROM tok GROUP BY 1, 2),
         |sc AS (
         |  SELECT ih.media_id, ch.caption_id, ($dot) AS score
         |  FROM ih JOIN ch USING (source)),
         |m AS (
         |  SELECT media_id, COUNT(*) AS n_cands,
         |    MAX(struct_pack(score := score, negid := -caption_id)) AS best
         |  FROM sc GROUP BY media_id)
         |SELECT media_id, n_cands, CAST(best.score AS BIGINT) AS score,
         |  -best.negid AS caption_id
         |FROM m""".stripMargin
    }
  )
}
