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

    // Stub video frame sampling (1→N expansion).
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleVideoFrames(Multimodal.mediaFromDocuments(s, dir)).toDF()),

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

  /** Exact per-lane byte sum (the corpus is ASCII, so 1 char = 1 byte
    * and `ascii()` is the byte value — asserted by the length check in
    * the spec).
    */
  private def laneSumSql(lane: Int): String =
    s"CAST(coalesce(list_sum([ascii(substring(text, i, 1)) " +
      s"for i in range(1, length(text) + 1) if (i - 1) % 16 = $lane]), 0) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      // nrm: the stub encoder normalizes to unit length EXCEPT for an
      // empty payload, whose zero vector keeps norm 0 (Multimodal
      // .StubCodecs.extractFeatures's n == 0 branch).
      s"""SELECT doc_id AS media_id, CAST(16 AS INT) AS dim,
         |  CAST(CASE WHEN octet_length(encode(text)) = 0
         |       THEN 0.0 ELSE 1.0 END AS DOUBLE) AS nrm,
         |  ${laneSumSql(0)} AS s0, ${laneSumSql(1)} AS s1,
         |  ${laneSumSql(2)} AS s2, ${laneSumSql(3)} AS s3,
         |  CAST(coalesce(list_sum([ascii(substring(text, i, 1))
         |    for i in range(1, length(text) + 1)]), 0) AS BIGINT) AS s_all
         |FROM documents""".stripMargin,
    "multimodal_meta" ->
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS digest
         |FROM documents""".stripMargin,
    "multimodal_image_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
         |  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS height,
         |  CAST(CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
         |FROM documents WHERE $kindSql = 'image'""".stripMargin,
    "multimodal_resize" ->
      s"""SELECT doc_id AS media_id,
         |  CAST(n AS BIGINT) AS n_bytes_in,
         |  CAST((n - 1) // greatest(n // least(n, 64), 1) + 1 AS BIGINT) AS n_bytes_out
         |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents
         |      WHERE $kindSql = 'image')""".stripMargin,
    "multimodal_frames" ->
      s"""SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
         |  CAST(greatest(octet_length(encode(text)) // 8, 1) AS BIGINT) AS frame_bytes
         |FROM documents, (VALUES (0), (2), (4), (6)) AS fr(f)
         |WHERE $kindSql = 'video'""".stripMargin,
    "multimodal_feature_knn" -> {
      val lanes = (0 until 16).map(l => s"${laneSumSql(l)} AS s${l}").mkString(",\n  ")
      def dot(a: String, b: String) =
        (0 until 16).map(l => s"$a.s$l * $b.s$l").mkString(" + ")
      def nrm2(a: String) = (0 until 16).map(l => s"$a.s$l * $a.s$l").mkString(" + ")
      s"""WITH ls AS (
         |  SELECT doc_id AS media_id,
         |  $lanes
         |  FROM documents)
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
