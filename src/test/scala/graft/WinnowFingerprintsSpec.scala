package graft

import graft.functions.TextFunctions.{ngrams, tokens}
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused native winnowing expression against the interpreted
  * r14 spelling (gram → md5 → per-window array_min → distinct) on
  * docs covering every boundary: empty, < g tokens (no grams),
  * exactly w grams (one window), duplicate-heavy text (distinct
  * collapse), and random corpora.
  */
class WinnowFingerprintsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val G = TextQueries.WinnowG
  private val W = TextQueries.WinnowW

  private def interpreted(c: org.apache.spark.sql.Column) = {
    val hl = transform(ngrams(tokens(c), G), g => md5(g))
    val nw = size(hl) - (W - 1)
    // bind hl via a struct field? The r14 query bound it to an
    // attribute; for the spec a sort_array-stable SET comparison is
    // enough, so inline evaluation is fine at fixture scale.
    when(nw >= 1,
      array_distinct(transform(sequence(lit(1), nw),
        i => array_min(slice(hl, i, lit(W))))))
      .otherwise(array().cast("array<string>"))
  }

  test("native winnow fingerprints equal the interpreted chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz")
    val docs = Seq("", "a b c", "a b c d", "a b c d e f g h",
      "a a a a a a a a a a a a") ++
      Seq.fill(40)(Seq.fill(3 + rnd.nextInt(60))(
        words(rnd.nextInt(words.size))).mkString(" "))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // hl must be a bound attribute for the interpreted form (the
    // ProbeWinnow trap); compare as sorted arrays — distinct sets.
    val got = df.select(col("doc_id"),
      sort_array(graft.functions.expressions.WinnowFingerprints(
        tokens(col("text")), G, W)).as("fp"))
    val want = df.select(col("doc_id"), sort_array(interpreted(col("text"))).as("fp"))
    assert(got.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap ==
      want.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap)
  }
}
