package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** |A ∩ B| of two *sorted, distinct* arrays via a two-pointer merge —
  * O(|A|+|B|) as a native codegen Catalyst expression. Supports
  * `array<string>` (binary UTF8 comparison — exactly Spark's string
  * ordering), `array<int>` and `array<long>`; the primitive variants
  * are allocation-free (no per-element UTF8String construction).
  *
  * `array_intersect` builds a hash set per evaluation; inside a
  * bucketed near-dup join it runs once per candidate pair and
  * dominates the profile (and when Catalyst pushes the similarity
  * filter into the join condition, it runs for *every* pair the cheap
  * guards would have discarded). Sorting each document's shingle set
  * once at scan time (array_sort) and merge-counting per pair is the
  * scalable shape.
  *
  * Inputs MUST be array_sort(array_distinct(...)).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private lazy val elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && Seq(StringType, IntegerType, LongType).contains(l) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size needs two array<string|int|bigint> of the same type, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val cmp = elementType match {
        case StringType => x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
        case IntegerType => java.lang.Integer.compare(x.getInt(i), y.getInt(j))
        case LongType => java.lang.Long.compare(x.getLong(i), y.getLong(j))
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val cmpExpr = elementType match {
        case StringType => s"$a.getUTF8String($i).binaryCompare($b.getUTF8String($j))"
        case IntegerType => s"java.lang.Integer.compare($a.getInt($i), $b.getInt($j))"
        case LongType => s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
