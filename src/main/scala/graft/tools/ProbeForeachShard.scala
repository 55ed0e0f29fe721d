package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Harness-attribution probe for the per-record sink (judge VERDICT
  * r13 item 6): `taxi_total_foreach` at sf10 pushes ~10 M blocking
  * upserts through ONE `SocketUpsertServer`, so the measured
  * 5.8×/decade is partly the stub's accept-loop + single-JVM-thread
  * serialization, not the writer. This runs the SAME pipeline with
  * one stub per shuffle partition (the writer maps partitions onto
  * the port ring) and with the single stub, times both, and verifies
  * both converge to the batch `taxi_total_count` result — the oracle
  * is unchanged, only the harness shards.
  *
  *   sbt "runMain graft.tools.ProbeForeachShard <sfDir> [nShards]"
  *
  * Driver-side measurement tool (not shipped library surface).
  */
object ProbeForeachShard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val nShards = if (args.length > 1) args(1).toInt else cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // batch truth once — both harness variants must converge to it
    val expect = graft.queries.TaxiQueries.queries("taxi_total_count")(spark, sfDir)
      .collect().map(_.toSeq).toSet

    def run(tag: String, servers: Int): Double = {
      val t0 = System.nanoTime()
      val got = graft.queries.StreamingQueries
        .totalForeachRun(spark, sfDir, servers)
      val rows = got.collect().map(_.toSeq).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows == expect,
        s"$tag diverged from batch truth: ${rows.size} vs ${expect.size} rows, " +
          s"sym-diff ${(rows.diff(expect) ++ expect.diff(rows)).take(3)}")
      println(f"[shard] $tag: $sec%.2f s (${rows.size} cells, converged)")
      sec
    }

    // warm once (JVM/stream machinery), then time each variant
    run("warmup(1 server)", 1)
    val single = run("single-server", 1)
    val sharded = run(s"sharded($nShards servers)", nShards)
    println(f"[shard] single $single%.2f s vs sharded $sharded%.2f s -> " +
      f"${single / sharded}%.2fx")
    spark.stop()
  }
}
