package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Σ (long)a_i · (long)b_i over two `array<int>` columns — the scoring
  * kernel of the QUANTIZED similarity path (`knn_int8`). Same tight
  * codegen loop as [[DotProductFloat]], but the integer domain makes
  * the result EXACT: int8 codes bound each term by 127², so a 64-dim
  * dot stays < 2²⁰ — no summation-order concerns, and the oracle
  * compares on equality, not rounding. At 100 TB the int8 corpus is
  * 4× smaller than float32 on the wire and in executor memory — this
  * expression is what makes searching it cheap too.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  /** Both sides must be array<int>: `ArrayData.getInt` reads 4 bytes
    * of an 8-byte slot on bigint/float/double arrays — silent garbage,
    * not an error — so the mismatch must fail analysis, not eval.
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot_int requires (array<int>, array<int>), got " +
            s"(${l.simpleString(3)}, ${r.simpleString(3)})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
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
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}

object DotProductInt {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
