package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join activation, pinned — the FOURTH join-scale lever
  * next to broadcast (PlanShapeSpec), bucketing (BucketedJoinSpec)
  * and runtime bloom filters (RuntimeFilterSpec), and the one that
  * needs no query change at all: salting (`events_salted_agg/join`)
  * is the *manual* skew fix the engine ships, AQE's
  * `OptimizeSkewedJoin` is the *runtime* one — a skewed shuffle
  * partition is split into advisory-sized chunks after the map
  * stage's actual sizes are known, and the other side's matching
  * partition is replicated to each chunk. At 100 TB a single hot
  * grid cell (O8's `keyBy` shuffle, the reference's
  * `examples/TotalArrivalCount.scala:77`) lands exactly here: one
  * straggler task holding 30% of the shuffle becomes N parallel
  * tasks, no code change, answer unchanged.
  *
  * Like RuntimeFilterSpec, the rewrite is invisible to every oracle
  * (it only re-partitions work), which is why it needs a plan spec:
  * the assertion is that the rule ENGAGES on a genuinely skewed
  * shape — a hot key holding 30% of the rows — once the size gates
  * are scaled to fixture bytes (the gates are cluster policy; the
  * rule and its split logic are stock Spark either way).
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Query stages are leaf nodes, so plain `collect` never descends
    * into a materialized AQE plan — flatten through them explicitly.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case q: QueryStageExec => flatten(q.plan)
    case _                 => p.children.flatMap(flatten)
  })

  test("OptimizeSkewedJoin splits the hot-key partition and preserves the answer") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap

    // hot key 0 holds 30% of the fact rows — its shuffle partition is
    // ~7× the median and over the (scaled-down) byte threshold
    def fact = spark.range(0, 200000).select(
      when(col("id") % 10 < 3, 0L).otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
    def dim = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") * 7).as("w"))
    def query = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("chk"))

    def run(): (org.apache.spark.sql.Row, org.apache.spark.sql.execution.SparkPlan) = {
      val df = query
      val row = df.collect().head
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      (row, finalPlan)
    }

    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the stock gates to fixture bytes: skewed = > factor ×
      // median AND > threshold; split target = advisory size
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
      // enough map partitions that the median is small vs the hot one
      conf.set("spark.sql.shuffle.partitions", "16")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // keep the join a shuffle join — skew handling targets those
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val (skewRow, finalPlan) = run()

      val skewJoins = flatten(finalPlan).collect {
        case j: SortMergeJoinExec if j.isSkewJoin     => j
        case j: ShuffledHashJoinExec if j.isSkewJoin  => j
      }
      assert(skewJoins.nonEmpty,
        s"OptimizeSkewedJoin did not engage — no skew-flagged shuffle join in the final plan:\n$finalPlan")
      // the hot-key partition must actually have been SPLIT: the
      // skew-side AQE shuffle read holds more partition specs than
      // the static partition count (extra specs = the split chunks)
      val reads = flatten(finalPlan).collect { case r: AQEShuffleReadExec => r }
      assert(reads.exists(r => r.partitionSpecs.size >
        spark.conf.get("spark.sql.shuffle.partitions").toInt),
        s"no AQE shuffle read shows split partitions:\n$finalPlan")

      // the rewrite must not change the answer
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (plainRow, plainPlan) = run()
      assert(flatten(plainPlan).collect {
        case j: SortMergeJoinExec if j.isSkewJoin    => j
        case j: ShuffledHashJoinExec if j.isSkewJoin => j
      }.isEmpty, "control run unexpectedly skew-split")
      assert(skewRow.getLong(0) == plainRow.getLong(0) &&
        skewRow.getLong(1) == plainRow.getLong(1),
        s"skew-split changed the answer: $skewRow vs $plainRow")
      assert(skewRow.getLong(0) == 200000L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
