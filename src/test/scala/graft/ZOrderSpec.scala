package graft

import graft.queries.StorageQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative pin of the z-order skipping contract the
  * `lineitem_zorder_spans` oracle entry reports: with the top 3 bits
  * of each 16-bit normalized dimension fixed per bucket, every
  * bucket's span in EACH dimension is bounded by ~1/8 of that
  * dimension's domain — so a range predicate on EITHER column skips
  * most buckets (files). The control arm shows why this needs the
  * interleave: single-column clustering leaves the other dimension's
  * per-bucket span at essentially full range, and the same predicate
  * touches essentially every file.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("z-buckets bound both dimensions; a range predicate skips most buckets") {
    val spans = StorageQueries.queries("lineitem_zorder_spans")(spark, sf)
      .collect()
    assert(spans.length > 32, "the 64-way prefix should be well populated")

    val li = Tables.lineitem(spark, sf)
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head()
    val (pkLo, pkHi) = (li.getLong(0), li.getLong(1))
    val (skLo, skHi) = (li.getLong(2), li.getLong(3))
    val pkBound = (pkHi - pkLo) / 8 + 2 // 3 fixed prefix bits -> 1/8 (+ rounding)
    val skBound = (skHi - skLo) / 8 + 2
    spans.foreach { r =>
      val pkSpan = r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min")
      val skSpan = r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min")
      assert(pkSpan <= pkBound, s"bucket ${r.getAs[Long]("bucket")} pk span $pkSpan > $pkBound")
      assert(skSpan <= skBound, s"bucket ${r.getAs[Long]("bucket")} sk span $skSpan > $skBound")
    }

    // skipping: a partkey range covering 1/16 of the domain must touch
    // few z-buckets (their pk min/max are the parquet footer stats a
    // reader prunes on)
    val (qLo, qHi) = (pkLo + (pkHi - pkLo) / 2, pkLo + (pkHi - pkLo) / 2 + (pkHi - pkLo) / 16)
    val touched = spans.count { r =>
      r.getAs[Long]("pk_min") <= qHi && r.getAs[Long]("pk_max") >= qLo
    }
    assert(touched.toDouble / spans.length <= 0.3,
      s"z-order should skip most buckets: touched $touched/${spans.length}")

    // control arm: cluster by l_suppkey ALONE (top 6 bits of its
    // normalized value) and the partkey spans collapse to full range
    val oneDim = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("ny", expr(s"((l_suppkey - $skLo) * 65535) div ${math.max(skHi - skLo, 1L)}"))
      .groupBy(shiftright(col("ny"), 10).as("bucket"))
      .agg(min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"))
      .collect()
    val touchedOneDim = oneDim.count { r =>
      r.getAs[Long]("pk_min") <= qHi && r.getAs[Long]("pk_max") >= qLo
    }
    assert(touchedOneDim.toDouble / oneDim.length >= 0.9,
      s"single-dim clustering should NOT skip on the other column: " +
        s"touched $touchedOneDim/${oneDim.length}")
  }
}
