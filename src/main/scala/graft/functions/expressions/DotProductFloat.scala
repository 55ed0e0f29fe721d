package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Σ (double)a_i · (double)b_i over two `array<float>` columns as a
  * native codegen'd Catalyst expression.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) are
  * interpreted (CodegenFallback) — fine for correctness, but a 64-dim
  * dot product per candidate pair dominates similarity/near-dup
  * profiles. This expression generates a tight primitive loop instead
  * (no lambda dispatch, no boxing), keeping the whole stage inside
  * codegen. Summation is index-order left-to-right with each operand
  * widened to double first — bit-identical to the HOF formulation in
  * `VectorFunctions.dot` and to the DuckDB oracle mirror.
  *
  * (The reference has no vector ops — this backs the §2.2 extension
  * operators; preference order (b) of the build contract: custom
  * Expression before custom physical operator.)
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
