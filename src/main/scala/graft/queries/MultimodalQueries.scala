package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable slice of the multimodal pipeline: the byte-level
  * metadata (sizes, digests, kind routing, stub-decoded dimensions)
  * is recomputable by DuckDB from the same `documents` rows, so the
  * binary plumbing — encode → partition-parallel decode → project —
  * is driver-verified end-to-end even though the codecs are stubs.
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

    // Stub image decode through the typed mapPartitions stage.
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

    // Stub resize + feature-extraction stages. The float32 feature
    // fold isn't robustly SQL-comparable, but its exact integer twin
    // (per-lane byte sums) is — projected here alongside dim and the
    // (unit) norm so the driver hard-checks the decode→fold plumbing.
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.resizeImages(Multimodal.mediaFromDocuments(s, dir)).toDF()),
    "multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .select(col("media_id"),
          org.apache.spark.sql.functions.size(col("features")).as("dim"),
          org.apache.spark.sql.functions.round(
            graft.functions.VectorFunctions.norm(col("features")), 3).as("nrm"),
          element_at(col("laneSums"), 1).as("s0"),
          element_at(col("laneSums"), 2).as("s1"),
          element_at(col("laneSums"), 3).as("s2"),
          element_at(col("laneSums"), 4).as("s3"),
          aggregate(col("laneSums"), lit(0L), (a, x) => a + x).as("s_all"))),

    // The composed training-data pipeline: media → partition-parallel
    // feature extraction → cosine top-k (decode → featurize → ANN) as
    // ONE dataflow — payloads never shuffle (features are extracted in
    // the scan stage), and the ANN stage reuses knn_brute's anatomy
    // (broadcast queries, bounded TopKByScore aggregator: Q×k×
    // partitions rows cross the shuffle, not Q×N). Scoring runs in
    // the laneSums integer domain — the exact shadow of the float
    // features (same byte fold, two domains; see MediaFeatures) — so
    // every dot product is integer-exact and the DuckDB oracle can
    // hash-match the full ranking, not just a rows-only check.
    "multimodal_feature_knn" -> ((s, dir) => {
      import s.implicits._
      val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .select(col("media_id"), col("laneSums"))
        // products and partial sums stay < 2^53 (lane sums are a few
        // thousand), so double accumulation here is EXACT — equality
        // with the oracle's BIGINT arithmetic is bit-level, not
        // approximate
        .withColumn("nrm",
          sqrt(aggregate(col("laneSums"), lit(0.0), (a, x) => a + x * x)))
      val q = feats.filter(col("media_id") % 50 === 0)
        .select(col("media_id").as("query_id"),
          col("laneSums").as("q_ls"), col("nrm").as("q_nrm"))
      val scored = broadcast(q).join(feats, col("query_id") =!= col("media_id"))
        .select(col("query_id"), col("media_id"),
          (aggregate(zip_with(col("q_ls"), col("laneSums"), (a, b) => a * b),
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

  /** Exact per-lane byte sum over a payload expression (ASCII corpus:
    * 1 char = 1 byte and `ascii()` is the byte value — asserted by the
    * length check in the spec).
    */
  private def laneSumSql(lane: Int, src: String = "text"): String =
    s"CAST(coalesce(list_sum([ascii(substring($src, i, 1)) " +
      s"for i in range(1, length($src) + 1) if (i - 1) % 16 = $lane]), 0) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      // nrm: the stub encoder normalizes to unit length EXCEPT for an
      // empty payload, whose zero vector keeps norm 0 (Multimodal
      // .StubCodecs.extractFeatures's n == 0 branch). Lane sums run
      // over the PAYLOAD bytes — for image rows that's the PGM
      // encoding, rebuilt by payloadCte.
      s"""WITH $payloadCte
         |SELECT doc_id AS media_id, CAST(16 AS INT) AS dim,
         |  CAST(CASE WHEN length(payload) = 0
         |       THEN 0.0 ELSE 1.0 END AS DOUBLE) AS nrm,
         |  ${laneSumSql(0, "payload")} AS s0, ${laneSumSql(1, "payload")} AS s1,
         |  ${laneSumSql(2, "payload")} AS s2, ${laneSumSql(3, "payload")} AS s3,
         |  CAST(coalesce(list_sum([ascii(substring(payload, i, 1))
         |    for i in range(1, length(payload) + 1)]), 0) AS BIGINT) AS s_all
         |FROM pm""".stripMargin,
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
      val lanes = (0 until 16).map(l => s"${laneSumSql(l, "payload")} AS s${l}").mkString(",\n  ")
      def dot(a: String, b: String) =
        (0 until 16).map(l => s"$a.s$l * $b.s$l").mkString(" + ")
      def nrm2(a: String) = (0 until 16).map(l => s"$a.s$l * $a.s$l").mkString(" + ")
      s"""WITH $payloadCte,
         |ls AS (
         |  SELECT doc_id AS media_id,
         |  $lanes
         |  FROM pm)
         |SELECT query_id, neighbor_id, rnk, cos_r FROM (
         |  SELECT q.media_id AS query_id, c.media_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.media_id
         |      ORDER BY (${dot("q", "c")}) / (sqrt(${nrm2("q")}) * sqrt(${nrm2("c")})) DESC,
         |               c.media_id ASC) AS rnk,
         |    ROUND((${dot("q", "c")}) / (sqrt(${nrm2("q")}) * sqrt(${nrm2("c")})), 6) AS cos_r
         |  FROM ls q JOIN ls c ON q.media_id % 50 = 0 AND q.media_id != c.media_id
         |) WHERE rnk <= 5""".stripMargin
    }
  )
}
