package graft

import graft.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL distinct-count sketches (Spark's built-in
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate, Apache
  * DataSketches) — the 100 TB form of COUNT(DISTINCT): per-shard
  * KB-sized register arrays merged associatively instead of
  * shuffling every distinct value. Sketch BYTES are engine-specific
  * (the MisraGries/HLL-twin policy: exact twins carry the oracle,
  * sketch behavior is spec-pinned): what must hold is pinned here —
  * partition-invariance, union-of-parts = sketch-of-whole, and
  * estimate accuracy against the exact count.
  */
class HllSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def events = Tables.events(spark, sf)

  test("sketch estimate is partitioning-invariant and near the exact count") {
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    def est(parts: Int): Long = events.repartition(parts)
      .select(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    val e1 = est(1)
    assert(e1 == est(16), "HLL registers are max-merged — partitioning cannot matter")
    assert(math.abs(e1 - exact).toDouble / exact <= 0.05,
      s"estimate $e1 vs exact $exact drifted beyond 5%")
  }

  test("union of per-type sketches equals the sketch of the whole") {
    // the shard-then-merge contract: per-event-type sketches (the
    // per-shard aggregation state) union into exactly the sketch a
    // single global pass would build — same registers, same estimate
    val whole = events
      .select(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    val merged = events
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    assert(merged == whole,
      s"union-of-parts estimate $merged != whole-pass estimate $whole")
  }
}
