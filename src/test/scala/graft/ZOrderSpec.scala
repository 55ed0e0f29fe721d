package graft

import graft.queries.StorageQueries
import graft.streaming.TempDir
import org.apache.spark.sql.DataFrame
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

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in the plan")
    scans.head.metrics("numOutputRows").value
  }

  /** End-to-end: actually WRITE the z-sorted layout and show parquet
    * row-group pruning (RowGroupSkippingSpec pins the mechanism)
    * engage on BOTH clustered dimensions, where the single-column
    * control layout only skips on its own sort key. This is the full
    * OPTIMIZE ZORDER loop: zv → sort-on-write → footer stats → reader
    * skips, measured by the scan's own row counter.
    */
  test("z-sorted parquet skips row groups on both dimensions; single-dim sort on one") {
    val zDir = TempDir.create("graft-z-file-")
    val sDir = TempDir.create("graft-s-file-")
    try {
      val sf01 = "/root/testdata/sf0.1"
      val li = Tables.lineitem(spark, sf01).select(col("l_partkey"), col("l_suppkey"))
      val b = li.agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
      val (pkLo, pkHi, skLo, skHi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      val withZ = li
        .withColumn("nx", expr(s"((l_partkey - $pkLo) * 65535) div ${math.max(pkHi - pkLo, 1L)}"))
        .withColumn("ny", expr(s"((l_suppkey - $skLo) * 65535) div ${math.max(skHi - skLo, 1L)}"))
        .withColumn("zv", Seq.tabulate(16) { i =>
          shiftright(col("nx"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
            shiftright(col("ny"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
        }.reduce(_ + _))
      val writer = (d: DataFrame, sortCol: String, path: String) =>
        d.sort(col(sortCol)).select(col("l_partkey"), col("l_suppkey"))
          .coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", 256 * 1024)
          .option("parquet.page.size", 16 * 1024)
          .parquet(path)
      writer(withZ, "zv", zDir.toString)
      writer(withZ, "l_suppkey", sDir.toString)

      val total = li.count()
      val pkPred = col("l_partkey") < lit(pkLo + (pkHi - pkLo) / 16)
      val skPred = col("l_suppkey") < lit(skLo + (skHi - skLo) / 16)
      def read(path: String) = spark.read.parquet(path)

      val zPk = scanRows(read(zDir.toString).filter(pkPred))
      val zSk = scanRows(read(zDir.toString).filter(skPred))
      val sPk = scanRows(read(sDir.toString).filter(pkPred))
      val sSk = scanRows(read(sDir.toString).filter(skPred))
      assert(zPk * 2 <= total, s"z layout should skip on partkey: read $zPk of $total")
      assert(zSk * 2 <= total, s"z layout should skip on suppkey: read $zSk of $total")
      assert(sSk * 2 <= total, s"suppkey-sorted layout should skip on its own key: $sSk")
      assert(sPk.toDouble >= total * 0.9,
        s"suppkey-sorted layout cannot skip on partkey: read $sPk of $total")
    } finally {
      TempDir.deleteRecursively(zDir.toString)
      TempDir.deleteRecursively(sDir.toString)
    }
  }
}
