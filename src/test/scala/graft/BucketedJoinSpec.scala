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

  test("lineitem_bucketed_join entry: zero exchange AND zero sort in the join subtree") {
    // The oracle entry's stronger contract: one file per bucket (the
    // repartition-before-write alignment) lets the scan expose the
    // per-bucket sortBy ordering, so the SMJ subtree needs neither an
    // Exchange nor a Sort — both shuffles AND both sorts of the
    // fact-fact join are paid at write time.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = graft.queries.StorageQueries
      .queries("lineitem_bucketed_join")(spark, "/root/testdata/sf0.001")
    val smj = df.queryExecution.sparkPlan
      .collect { case j: SortMergeJoinExec => j }
    assert(smj.size == 1, s"expected one SortMergeJoin, got ${smj.size}")
    val subtree = smj.head.collect { case p => p }
    assert(!subtree.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"join subtree still shuffles:\n${smj.head}")
    assert(!subtree.exists(_.isInstanceOf[SortExec]),
      s"join subtree still sorts (files-per-bucket > 1?):\n${smj.head}")
  }
}
