package graft

import graft.functions.expressions.{DotProductFloat, PackedTrigrams, SortedIntersectSize, WordNgrams}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL surface for the engine's custom Catalyst expressions, so SQL
  * users get the same codegen'd hot paths as the Column API:
  *
  *   SELECT graft_dot(a.embedding, b.embedding) ...
  *   SELECT graft_intersect_size(a.tg, b.tg) ...
  *
  * Two registration routes:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (also via `spark.sql.extensions=graft.GraftExtensions`);
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, builder) =>
      e.injectFunction(ColumnBridge.functionDescription(name, builder))
    }
}

object GraftExtensions {
  private[graft] val injections
      : Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_dot" -> (exprs => DotProductFloat(exprs(0), exprs(1))),
    "graft_intersect_size" -> (exprs => SortedIntersectSize(exprs(0), exprs(1))),
    "graft_trigrams" -> (exprs => PackedTrigrams(exprs(0))),
    // n must be a foldable int literal: graft_word_ngrams(text, 5)
    "graft_word_ngrams" -> (exprs =>
      WordNgrams(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
