package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** AS-OF JOIN as a full custom operator: logical node → planner
  * strategy → sort-merge physical exec.
  *
  * Semantics (inner as-of, matching DuckDB's `ASOF JOIN`): for every
  * left row (k, t), join the single right row with the same key and
  * the greatest right-time ≤ t; left rows with no such row drop out.
  *
  * Spark has no native as-of join; the composable workaround
  * (theta-join on `k = k AND rt <= t` + window rank) materializes every
  * (left × right-history) pair before ranking — O(n·h) shuffle volume.
  * This operator is the (c) tier of the build contract (custom
  * LogicalPlan + Strategy + SparkPlan, registered per session): both
  * sides hash-partition on the key and sort by (key, time) — exactly a
  * sort-merge join's movement — and each pair of co-partitions merges
  * with a two-pointer walk carrying the latest as-of candidate, O(n+m)
  * per partition, no pair blow-up. At 100 TB this is the difference
  * between a feasible event-attribution join and an exploding one.
  *
  * The reference has no joins at all (SURVEY §2.1); this extends the
  * engine the same way its latent ride-duration join does.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Both sides cluster on the key (EnsureRequirements co-partitions
  // them) and sort by (key, time) — the same data movement a
  // sort-merge join performs.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrdering = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkEval = UnsafeProjection.create(Seq(lk), lOut)
      val ltEval = UnsafeProjection.create(Seq(lt), lOut)
      val rkEval = UnsafeProjection.create(Seq(rk), rOut)
      val rtEval = UnsafeProjection.create(Seq(rt), rOut)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val bufferedRight = rIter.buffered

      var candidate: InternalRow = null
      var candidateKey: Any = null

      val keyOrd = keyOrdering.asInstanceOf[Ordering[Any]]
      val timeOrd = timeOrdering.asInstanceOf[Ordering[Any]]

      lIter.flatMap { lRow =>
        val kRow = lkEval(lRow)
        val tRow = ltEval(lRow)
        if (kRow.isNullAt(0) || tRow.isNullAt(0)) {
          None // SQL join semantics: null keys/times never match
        } else {
          val k = kRow.get(0, lk.dataType)
          val t = tRow.get(0, lt.dataType)
          // advance right while its (key, time) can still be an as-of
          // candidate for (k, t)
          var advancing = true
          while (advancing && bufferedRight.hasNext) {
            val head = bufferedRight.head
            val hkRow = rkEval(head)
            if (hkRow.isNullAt(0) || rtEval(head).isNullAt(0)) {
              bufferedRight.next() // null key/time: never a candidate
            } else {
              val hk = hkRow.get(0, rk.dataType)
              val c = keyOrd.compare(hk, k)
              if (c < 0) {
                bufferedRight.next() // stale key: skip, not a candidate
              } else if (c == 0 &&
                  timeOrd.compare(rtEval(head).get(0, rt.dataType), t) <= 0) {
                candidate = bufferedRight.next().copy()
                // copy: for buffer-backed types (UTF8String/binary) the
                // projection's output buffer is reused on the next eval
                candidateKey = InternalRow.copyValue(hk)
              } else {
                advancing = false
              }
            }
          }
          if (candidate != null && keyOrd.compare(candidateKey, k) == 0) {
            Some(resultProj(joined(lRow, candidate)))
          } else None
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API: resolves key/time columns by name against each
  * side and installs the strategy on the session.
  *
  * CONTRACT on right-side duplicates: each left row joins the right
  * row with the MAXIMUM right time ≤ its time — exactly one output
  * row per matched left row, and the matched TIME is deterministic.
  * If several right rows share that maximum (key, time), WHICH of the
  * tied rows supplies the payload is unspecified (the walk keeps the
  * last tied row in partition sort order, and the sort is on
  * (key, time) only) — the same contract as pandas `merge_asof` on
  * unsorted duplicates. Callers needing tied-payload determinism
  * pre-aggregate the right side to unique (key, time), as
  * `events_asof_join` does. Pinned by `AsOfJoinSpec`'s tie property.
  */
object AsOf {
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    ColumnBridge.addStrategy(spark, AsOfStrategy)
    val lPlan = ColumnBridge.analyzedPlan(leftDf)
    val rPlan0 = ColumnBridge.analyzedPlan(rightDf)
    // Self-join safety: if the two sides share exprIds (same source
    // relation), re-alias the right side so output binding and the
    // merge expressions stay unambiguous.
    val rPlan =
      if (rPlan0.output.map(_.exprId).toSet.intersect(lPlan.output.map(_.exprId).toSet).nonEmpty) {
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.Project
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      } else rPlan0
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lk, rk) = (resolve(lPlan, leftKeyCol), resolve(rPlan, rightKeyCol))
    val (lt, rt) = (resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol))
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType.sql} vs ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    ColumnBridge.ofRows(spark, AsOfJoin(lPlan, rPlan, lk, rk, lt, rt))
  }
}
