package graft.tools

import graft.Tables
import graft.functions.TextFunctions.{ngrams, tokens}
import graft.queries.TextQueries.{WinnowG, WinnowMaxDf, WinnowW}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for text_winnow's 50 s anomaly at sf0.1:
  * times (a) tokenize+gram+md5, (b) the window-min fingerprint
  * selection, (c) the exploded fp relation, (d) the bucket self-join —
  * to find where the wall-clock actually goes.
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
    }

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    docs.count()

    time("tokens only")(docs.select(size(tokens(col("text"))).as("nt")).agg(sum(col("nt"))).count())
    val gl = ngrams(tokens(col("text")), WinnowG)
    time("grams")(docs.select(explode(gl)).count())
    val hl = transform(gl, g => md5(g))
    time("gram md5")(docs.select(explode(hl)).count())
    val nw = size(hl) - (WinnowW - 1)
    val fpsExpr = when(nw >= 1,
        array_distinct(transform(sequence(lit(1), nw),
          i => array_min(slice(hl, i, lit(WinnowW))))))
      .otherwise(array().cast("array<string>"))
    time("fps (no explode)")(docs.select(size(fpsExpr)).count())
    time("fps exploded")(docs.select(col("doc_id"), explode(fpsExpr).as("fp")).count())
    // bound-attribute form: hl projected first, lambda reads the column
    val hlA = col("hl")
    val nwA = size(hlA) - (WinnowW - 1)
    val fpsA = when(nwA >= 1,
        array_distinct(transform(sequence(lit(1), nwA),
          i => array_min(slice(hlA, i, lit(WinnowW))))))
      .otherwise(array().cast("array<string>"))
    time("fps exploded, hl bound")(
      docs.select(col("doc_id"), hl.as("hl"))
        .select(col("doc_id"), explode(fpsA).as("fp")).count())
    val fp = docs.select(col("doc_id"), explode(fpsExpr).as("fp")).localCheckpoint()
    val shared = fp.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= WinnowMaxDf).select(col("fp"))
    time("shared")(shared.count())
    val hits = fp.join(shared, "fp")
    time("pair join")(
      hits.select(col("fp"), col("doc_id").as("doc_a"))
        .join(hits.select(col("fp"), col("doc_id").as("doc_b")), "fp")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared")).count())
    spark.stop()
  }
}
