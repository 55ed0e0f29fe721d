package graft

import graft.functions.expressions.{DotProductFloat, DotProductInt, MinHashSignature, PackedTrigrams, SimHash16, SortedIntersectSize, WordNgrams}
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
    // n must be a foldable int literal ≥ 2: graft_word_ngrams(text, 5).
    // Validated here so misuse surfaces as a clear message at plan
    // time — not a ClassCastException/NPE from a raw eval(), and not
    // WordNgrams' bare require() for n < 2. eval() only runs on a
    // RESOLVED foldable expression (an unresolved one would throw an
    // unhelpful UnresolvedException at registration time).
    "graft_dot_int" -> (exprs => DotProductInt(exprs(0), exprs(1))),
    "graft_simhash16" -> (exprs => SimHash16(exprs(0))),
    // fixed 16×5 signature parameters — the MinHash object's contract;
    // parameterizing them through SQL literals would let one caller
    // silently produce band-incompatible signatures
    "graft_minhash_sig" -> (exprs =>
      MinHashSignature(exprs(0), graft.functions.MinHash.NumHashes, 5)),
    "graft_word_ngrams" -> { exprs =>
      val nExpr = exprs(1)
      val n = if (nExpr.resolved && nExpr.foldable) nExpr.eval() else null
      n match {
        case i: Number if i.intValue >= 2 => WordNgrams(exprs(0), i.intValue)
        case _ => throw new IllegalArgumentException(
          "graft_word_ngrams(text, n): n must be an integer literal >= 2, " +
            s"got ${nExpr.sql}")
      }
    })

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
