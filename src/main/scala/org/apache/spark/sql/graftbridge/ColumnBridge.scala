package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}

/** Column ⇄ Expression bridge. Spark 4 moved the classic `Column`
  * internals behind `private[sql]` (`columnNodeSupport.scala`); custom
  * Catalyst expressions still need to surface as `Column`s and reach
  * the function registry. The usual extension-library pattern: one
  * tiny accessor inside the `org.apache.spark.sql` namespace, nothing
  * else lives here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  type FunctionBuilder = Seq[Expression] => Expression

  def functionDescription(name: String, builder: FunctionBuilder)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder)

  def registerFunction(spark: SparkSession, name: String, builder: FunctionBuilder): Unit =
    ClassicConversions.castToImpl(spark).sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Analyzed logical plan of a DataFrame (for building custom
    * logical operators over existing frames).
    */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    ClassicConversions.castToImpl(df).queryExecution.analyzed

  /** DataFrame over a custom LogicalPlan. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      ClassicConversions.castToImpl(spark), plan)

  /** Install an extra planner strategy on a live session. */
  def addStrategy(spark: SparkSession, strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = ClassicConversions.castToImpl(spark).experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
