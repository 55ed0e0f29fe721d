package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts behind `events_bitmap_distinct` / `events_bitmap_stream`
  * that the COUNT(DISTINCT) oracle can't express: the OR-merge
  * algebra's partitioning invariance (the mergeability claim),
  * idempotence under replay (the at-least-once claim the streaming
  * twin rides), and mask positivity (the 63-bit sign-free contract).
  */
class BitmapDistinctSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def blocks(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] = {
    val bits = EventQueries.BmBits
    df.select(col("event_type"),
        expr(s"user_id div $bits").as("block"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(user_id % $bits AS INT))").as("m"))
      .groupBy(col("event_type"), col("block"))
      .agg(bit_or(col("m")).as("bm"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("popcount over bitmap blocks equals the exact distinct count per type") {
    val ev = Tables.events(spark, sf).filter(col("value") >= EventQueries.KmvValueMin)
    val viaBitmap = blocks(ev).toSeq
      .groupBy(_._1._1)
      .map { case (t, kvs) => t -> kvs.map(kv => java.lang.Long.bitCount(kv._2).toLong).sum }
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBitmap == exact, s"bitmap distinct drifted: $viaBitmap vs $exact")
  }

  test("OR-merge is partitioning-invariant AND replay-idempotent") {
    val ev = Tables.events(spark, sf).filter(col("value") >= EventQueries.KmvValueMin)
    val one = blocks(ev.repartition(1))
    val many = blocks(ev.repartition(16))
    assert(one == many, "block OR must not depend on scan partitioning")
    // replay-proof: feeding every event TWICE changes nothing — the
    // property that makes OR the only algebra here that absorbs
    // at-least-once delivery without keyed idempotency
    val doubled = blocks(ev.unionAll(ev))
    assert(one == doubled, "OR-merge must be idempotent under replay")
  }

  test("every mask and merged block stays positive (the 63-bit contract)") {
    val bad = blocks(Tables.events(spark, sf)).values.count(_ < 0L)
    assert(bad == 0, s"$bad negative block words — bit 63 leaked in")
  }
}
