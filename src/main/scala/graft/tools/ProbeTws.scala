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
    // MapState-vs-blob A/B, best-of-2 each, interleaved so fixture
    // cache warm-up and window drift hit both forms equally
    def time(label: String, f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[tws] $label%-9s rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      n
    }
    var nMap = 0L; var nBlob = 0L
    (1 to 2).foreach { _ =>
      nBlob = time("blob",
        graft.queries.StreamingQueries.earlyTwsStream(spark, sfDir, 3).count())
      nMap = time("mapstate",
        graft.queries.StreamingQueries.earlyTwsMapProbe(spark, sfDir, 3).count())
    }
    assert(nMap == nBlob, s"blob twin diverged: $nMap vs $nBlob")
    spark.stop()
  }
}
