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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // The runtime half of the pruning story: the fact is partitioned
    // on the JOIN key and the selective filter sits on the DIM side —
    // static pruning can't fire (no literal predicate on the fact),
    // so Catalyst must inject a dynamicpruning subquery into the fact
    // scan's PartitionFilters (fed by the broadcast of the filtered
    // dim). At 100 TB this is what keeps a date-dimension join from
    // scanning every day of a partitioned fact.
    val dir = TempDir.create("graft-dpp-")
    // AQE off: AdaptiveSparkPlanExec hides the physical tree from
    // collect() (the PlanShapeSpec policy); DPP itself is a
    // pre-adaptive optimizer rule either way.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").mode("overwrite").parquet(dir.toString)
      val fact = spark.read.parquet(dir.toString)
      val dim = fact.select(col("day")).distinct()
        .withColumn("dow", dayofweek(col("day")))
        .filter(col("dow") === 3)
      val joined = fact.join(dim, Seq("day")).groupBy(col("day")).count()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"no dynamicpruning subquery in the fact scan:\n${planStr.take(2000)}")
      // and it actually prunes: the scan reads fewer files than the layout has
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val scanNode = joined.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.exists(_.toString.contains("dynamicpruning")) => f
      }
      assert(scanNode.nonEmpty, "no fact scan with a dynamicpruning partition filter")
      val read = scanNode.head.metrics("numFiles").value
      assert(read < fact.inputFiles.length,
        s"DPP read $read of ${fact.inputFiles.length} files")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      TempDir.deleteRecursively(dir.toString)
    }
  }

  test("dynamic partition overwrite leaves untouched partitions' files in place") {
    // the physical half of docs_dynamic_overwrite's contract (the
    // oracle pins values; this pins that untouched directories are
    // not rewritten — at 100 TB the entire point of dynamic mode)
    val dir = TempDir.create("graft-dynov-")
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("source"), col("n_chars"))
      docs.write.mode("overwrite").partitionBy("source").parquet(dir.toString)
      def files(sub: String): Set[String] = {
        val d = new java.io.File(s"$dir/$sub")
        val ls = d.listFiles()
        assert(ls != null, s"partition dir missing: $d")
        ls.filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName + ":" + f.lastModified).toSet
      }
      val untouchedBefore = files("source=src1")
      val touchedBefore = files("source=src3")
      docs.filter(col("source") === "src3")
        .withColumn("n_chars", col("n_chars") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("source").parquet(dir.toString)
      assert(files("source=src1") == untouchedBefore,
        "dynamic overwrite rewrote an untouched partition")
      assert(files("source=src3") != touchedBefore,
        "dynamic overwrite did not replace the written partition")
      // and a STATIC overwrite of the same frame would have dropped
      // every other partition — prove the mode is load-bearing
      val total = spark.read.parquet(dir.toString)
        .select("source").distinct().count()
      assert(total == 20, s"expected all 20 sources after dynamic overwrite, got $total")
    } finally TempDir.deleteRecursively(dir.toString)
  }
}
