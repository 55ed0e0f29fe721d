package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: per-batch progress JSON for the taxi_early_tws
  * entry, to attribute its wall time (state updates vs commit vs
  * timer processing vs planning). Usage:
  *   sbt "runMain graft.tools.ProbeTws [sfDir]"
  */
class TwsProgressListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    println("[tws] " + e.progress.json)
}

object ProbeTws {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.TwsProgressListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.queries.StreamingQueries.earlyTwsStream(spark, sfDir, 3).count()
    println(f"[tws] rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
