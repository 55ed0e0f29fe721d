package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the THIRD join-scale lever next
  * to broadcast (PlanShapeSpec) and bucketing (BucketedJoinSpec): when
  * a selective dim-side filter can't be pushed to the fact scan as a
  * static predicate (the filter is on the dim, not the fact), Catalyst
  * can build a bloom filter over the surviving join keys and inject a
  * `might_contain` probe into the fact side — rows that can't join are
  * dropped at the scan, before the shuffle. At 100 TB this turns
  * "shuffle the whole fact table to join 1% of it" into "shuffle ~1%
  * (+ FPR)". The rewrite is semantics-preserving (false positives are
  * dropped by the real join), so every oracle stays green whether or
  * not the filter fires — exactly why it needs a plan-shape spec: a
  * config flip would silently cost the 99% at scale.
  *
  * Spark gates injection on estimated sizes (creation side small,
  * application side large); the fixture can't meet the 10 GB default,
  * so the spec lowers the thresholds — the assertion is that the
  * rewrite ENGAGES on this plan shape, the sizes are cluster policy.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom-filter probe into the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: injection targets the pre-shuffle scan
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom-filter runtime probe injected:\n$optimized")
      // the rewrite must not change the answer
      val expected = li.join(ord.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.collect().head.getLong(0) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
