package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` — the single-pass data-quality-counter surface a
  * production pipeline hangs its freshness/completeness alerts on:
  * metrics accumulate DURING the main job's one pass over the data
  * (no second audit scan — at 100 TB the whole point), and surface
  * through the observation API when the action completes. The spec
  * pins the contract the engine relies on: observed counters equal
  * independently-computed aggregates, and observation does not
  * perturb the observed query's result.
  */
class ObserveMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("observed quality counters equal a separate audit pass; rows unperturbed") {
    import org.apache.spark.sql.Observation
    val obs = Observation("docs_quality")
    val gated = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        count(col("lang")).as("n_with_lang"),
        sum(col("n_chars")).as("chars_sum"),
        max(col("doc_id")).as("max_id"))
      .filter(col("n_chars") > 0)
    val gotRows = gated.count()
    val m = obs.get
    // independent audit pass over the SAME relation
    val want = Tables.documents(spark, sf)
      .agg(count(lit(1)), count(col("lang")), sum(col("n_chars")),
        max(col("doc_id"))).head
    assert(m("n_rows") == want.getLong(0))
    assert(m("n_with_lang") == want.getLong(1))
    assert(m("chars_sum") == want.getLong(2))
    assert(m("max_id") == want.getLong(3))
    // observation sits ABOVE the scan, BELOW the filter: it must see
    // every scanned row even though the query returns fewer
    assert(gotRows <= m("n_rows").asInstanceOf[Long])
    assert(gotRows == Tables.documents(spark, sf)
      .filter(col("n_chars") > 0).count())
  }

  /** The STREAMING half of the same surface: `observe` on a streaming
    * Dataset emits its counters PER MICRO-BATCH through
    * `StreamingQueryProgress.observedMetrics` — the hook a live
    * pipeline's freshness/anomaly alerts poll without a second
    * stateful aggregation in the query. The per-batch counters must
    * sum to the corpus totals and attribute rows to the batches that
    * actually carried them.
    */
  test("streaming observe: per-micro-batch counters sum to the corpus totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import ss.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val ms = MemoryStream[Long]
    val name = "obs" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = ms.toDF()
      .observe("batch_quality",
        count(lit(1)).as("n_rows"),
        sum(col("value")).as("v_sum"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    val batches = Seq(Seq(1L, 2L, 3L), Seq(10L), Seq(100L, 200L))
    try {
      batches.foreach { xs => ms.addData(xs); q.processAllAvailable() }
      val seen = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("batch_quality")))
        .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("v_sum")))
      assert(seen.map(_._1) == batches.map(_.size.toLong),
        s"per-batch row counters must track each micro-batch: $seen")
      assert(seen.map(_._2) == batches.map(_.sum),
        s"per-batch sums must attribute values to their batch: $seen")
      assert(seen.map(_._1).sum == batches.map(_.size).sum &&
        seen.map(_._2).sum == batches.flatten.sum,
        "the per-batch counters must sum to the corpus totals")
    } finally q.stop()
  }
}
