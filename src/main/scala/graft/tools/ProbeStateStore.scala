package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe: HDFSBackedStateStoreProvider vs RocksDBStateStoreProvider
  * (+ changelog checkpointing) across every streaming replay entry.
  *
  *   sbt "runMain graft.tools.ProbeStateStore [sfDir] [passes]"
  *
  * Each replay query builds a fresh isolated session + checkpoint dir,
  * so the provider can be flipped per-pass via the `graft.stateProvider`
  * system property (read by StreamingQueries.streamSession) without
  * restarting the JVM. Alternating H,R,H,R per pass keeps co-tenant
  * load drift from biasing one arm; best-of-N per arm is reported, the
  * same noise policy as Bench. Results recorded in SCALE.md.
  */
object ProbeStateStore {
  private val streamingEntries = Seq(
    "taxi_total_stream", "taxi_running_stream", "taxi_sliding_stream",
    "taxi_early_stream", "taxi_early_fires", "taxi_duration_stream",
    "taxi_dedup_stream", "taxi_late_drop", "taxi_sliding_file_stream",
    "events_sessionize_stream")

  private def materialize(df: DataFrame): Unit = {
    val _ = df.agg(max(xxhash64(struct(df.columns.map(col): _*)))).collect()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    def runPass(provider: String): Map[String, Double] = {
      if (provider == "rocksdb") sys.props("graft.stateProvider") = "rocksdb"
      else sys.props.remove("graft.stateProvider")
      streamingEntries.map { name =>
        val t0 = System.nanoTime()
        try materialize(SparkEntry.queries(name)(spark, sfDir))
        catch { case e: Throwable => println(s"[probe] $name/$provider FAILED: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }

    // warm both arms once (untimed) so first-use init (RocksDB native
    // lib load, codegen) lands outside the measurement
    sys.props("graft.stateProvider") = "rocksdb"
    try materialize(SparkEntry.queries("taxi_total_stream")(spark, sfDir))
    catch { case e: Throwable => println(s"[probe] rocksdb warmup FAILED: $e") }
    sys.props.remove("graft.stateProvider")
    materialize(SparkEntry.queries("taxi_total_stream")(spark, sfDir))

    val hdfs = Seq.newBuilder[Map[String, Double]]
    val rocks = Seq.newBuilder[Map[String, Double]]
    (1 to passes).foreach { p =>
      hdfs += runPass("hdfs")
      rocks += runPass("rocksdb")
      println(s"[probe] pass $p/$passes done")
    }
    def best(rs: Seq[Map[String, Double]]): Map[String, Double] =
      streamingEntries.map(n => n -> rs.map(_(n)).min).toMap
    val h = best(hdfs.result()); val r = best(rocks.result())
    println(f"${"query"}%-28s ${"hdfs"}%8s ${"rocksdb"}%8s  ratio")
    streamingEntries.foreach { n =>
      println(f"$n%-28s ${h(n)}%8.2f ${r(n)}%8.2f  ${r(n) / h(n)}%.2fx")
    }
    println(f"${"TOTAL"}%-28s ${h.values.sum}%8.2f ${r.values.sum}%8.2f  ${r.values.sum / h.values.sum}%.2fx")
    spark.stop()
  }
}
