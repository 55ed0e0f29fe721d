package graft

import graft.streaming.TempDir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's scan contract, asserted: at 100 TB the single test
  * files become date/source-partitioned directories and `Tables` is
  * the one seam — queries themselves change nothing. This spec proves
  * the two plan properties that claim rests on, against a real
  * partitioned layout written from the test data:
  *
  *  - partition pruning: a `day =` filter reads only the matching
  *    directory (observable via the scan's `numFiles` metric after
  *    execution — `inputFiles` lists the relation pre-pruning);
  *  - predicate pushdown composes with it: a non-partition filter on
  *    the same read still reaches the parquet scan as a PushedFilter.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("date-partitioned layout prunes directories and keeps pushdown") {
    val dir = TempDir.create("graft-part-")
    try {
      Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").mode("overwrite").parquet(dir.toString)

      val full = spark.read.parquet(dir.toString)
      val days = full.select("day").distinct().count()
      assert(days > 5, s"need a multi-partition layout, got $days days")
      val allFiles = full.inputFiles.length

      val oneDay = full.filter(col("day") === lit("2024-01-03"))
      assert(oneDay.collect().nonEmpty)
      val scanNode = oneDay.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scanNode.nonEmpty, "no FileSourceScanExec in the plan")
      val prunedFiles = scanNode.head.metrics("numFiles").value
      assert(prunedFiles < allFiles,
        s"pruning read $prunedFiles of $allFiles files")
      // and the pruning is static plan-time partition filtering
      assert(scanNode.head.toString.contains("PartitionFilters"))

      // non-partition predicate on the pruned read still pushes down
      val both = full.filter(col("day") === lit("2024-01-03") && col("user_id") === 7)
      val scan = both.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
      assert(scan.contains("PushedFilters") && scan.contains("EqualTo(user_id,7)"),
        s"user_id filter not pushed to the scan:\n$scan")
    } finally TempDir.deleteRecursively(dir.toString)
  }
}
