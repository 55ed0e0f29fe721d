package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's bucketing claim, demonstrated: two tables bucketed by
  * the join key at write time join with NO shuffle exchange — the
  * standing fix for the fact-fact join at petabyte scale.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("co-bucketed tables join without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"lineitem side still shuffles:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orders side still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("bucketed band-index probe: only the DELTA side shuffles/sorts") {
    // dedup_incremental_bucketed's layout contract: the persisted
    // band index (bucketed + sorted on the probe key) contributes
    // zero Exchange and zero Sort to the probe SMJ — the one exchange
    // and one sort in the join subtree both belong to the delta side.
    // This is the "only the delta shuffles, every day-2 batch" claim
    // as a pinned plan shape.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // AQE off BEFORE the builder runs: the probe scopes its legacy
    // ordering flag via a child session that snapshots the parent's
    // runtime conf at build time (Tables.scopedSession), so a later
    // conf.set on the parent would no longer reach the frame's plan.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val cand = graft.queries.DedupQueries
      .bucketedBandProbe(spark, "/root/testdata/sf0.001")
    try {
      // executedPlan (EnsureRequirements applied): exchanges and
      // sorts are real here, so absence is a statement, not a vacuity
      val smj = cand.queryExecution.executedPlan
        .collect { case j: SortMergeJoinExec => j }
      assert(smj.size == 1, s"expected one SortMergeJoin, got ${smj.size}")
      // index side = left (the catalog table is the join's left input)
      val idxSide = smj.head.left.collect { case p => p }
      assert(!idxSide.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"index side still shuffles:\n${smj.head}")
      assert(!idxSide.exists(_.isInstanceOf[SortExec]),
        s"index side still sorts (files-per-bucket > 1?):\n${smj.head}")
      val deltaSide = smj.head.right.collect { case p => p }
      assert(deltaSide.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "delta side must be the one that shuffles to the index's buckets")
      assert(cand.count() > 0, "probe must surface candidates at sf0.001")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP TABLE IF EXISTS ${graft.queries.DedupQueries.BandIdxTable}")
    }
  }

  test("lineitem_bucketed_join entry: zero exchange AND zero sort in the join subtree") {
    // The oracle entry's stronger contract: one file per bucket (the
    // repartition-before-write alignment) + the SPARK-28632 legacy
    // ordering flag let the scan expose the per-bucket sortBy
    // ordering, so the SMJ subtree needs neither an Exchange nor a
    // Sort — both shuffles AND both sorts of the fact-fact join are
    // paid at write time. Asserted on the EXECUTED plan with AQE off
    // (the r10 sparkPlan-based form ran before EnsureRequirements
    // inserted exchanges/sorts and was vacuous — the sorts were real).
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.queries.StorageQueries
        .queries("lineitem_bucketed_join")(spark, "/root/testdata/sf0.001")
      val smj = df.queryExecution.executedPlan
        .collect { case j: SortMergeJoinExec => j }
      assert(smj.size == 1, s"expected one SortMergeJoin, got ${smj.size}")
      val subtree = smj.head.collect { case p => p }
      assert(!subtree.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"join subtree still shuffles:\n${smj.head}")
      assert(!subtree.exists(_.isInstanceOf[SortExec]),
        s"join subtree still sorts (files-per-bucket > 1?):\n${smj.head}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
