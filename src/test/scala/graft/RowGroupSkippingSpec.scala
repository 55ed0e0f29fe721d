package graft

import graft.streaming.TempDir
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The physical mechanism the z-order / sort-on-write story rests on
  * (`lineitem_zorder_spans` reports the min/max spans; this pins that
  * Spark's parquet scan actually SKIPS on them): parquet stores
  * per-row-group min/max stats, and a pushed-down range predicate
  * prunes whole row groups before decoding a byte. Skipping is a
  * property of the LAYOUT, not the reader — the same file contents
  * sorted by the predicate column collapse the scan to ~the selected
  * rows, while a scrambled layout makes every row group's min/max
  * span the full domain and the reader must decode everything. At
  * 100 TB this factor is the difference between reading 5 TB and
  * reading 100 TB for the same query.
  *
  * Row groups are forced small (64 KB vs the 128 MB default) so the
  * 5k-doc fixture carries dozens of groups — the same stats-per-group
  * geometry a production file has at real block sizes.
  */
class RowGroupSkippingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.1"

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in the plan")
    scans.head.metrics("numOutputRows").value
  }

  test("sorted layout skips row groups on a pushed range predicate; scrambled cannot") {
    val sortedDir = TempDir.create("graft-rg-sorted-")
    val scrambledDir = TempDir.create("graft-rg-scrambled-")
    try {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val total = docs.count()
      val writer = (d: DataFrame, path: String) =>
        d.coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", 64 * 1024)
          .option("parquet.page.size", 8 * 1024)
          .parquet(path)
      writer(docs.sort(col("doc_id")), sortedDir.toString)
      writer(docs.sort(md5(col("text"))), scrambledDir.toString)

      // a ~5% doc_id slice; same predicate against both layouts
      val hi = total / 20
      def slice(path: String) =
        spark.read.parquet(path).filter(col("doc_id") < hi)

      val wantRows = slice(sortedDir.toString).count()
      assert(wantRows > 0 && slice(scrambledDir.toString).count() == wantRows,
        "both layouts must agree on the answer")

      val sortedScan = scanRows(slice(sortedDir.toString))
      val scrambledScan = scanRows(slice(scrambledDir.toString))
      // threshold, not equality: the contrast only needs the scrambled
      // layout to be NEAR-unskippable — demanding that literally every
      // 64 KB row group straddles the predicate would make the suite
      // hostage to fixture regeneration letting one group skip by chance
      assert(scrambledScan >= (total * 9) / 10,
        s"scrambled layout should decode nearly everything: $scrambledScan of $total")
      assert(sortedScan * 4 <= scrambledScan,
        s"sorted layout should skip most row groups: scan read $sortedScan " +
          s"vs scrambled $scrambledScan")
      // and the predicate really is pushed (skipping happens in the
      // reader, not a Spark-side Filter)
      val scanStr = slice(sortedDir.toString)
        .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
      assert(scanStr.contains("PushedFilters") && scanStr.contains("LessThan(doc_id"),
        s"range predicate not pushed to the scan:\n$scanStr")
    } finally {
      TempDir.deleteRecursively(sortedDir.toString)
      TempDir.deleteRecursively(scrambledDir.toString)
    }
  }
}
