package graft.tools

import java.util.UUID

import graft.streaming.{EventsReplay, TempDir}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.StateStoreBridge

/** Attribution probe for the streaming replay FLOOR (scratch tool):
  * runs the same watermarked file-replay aggregation N times in one
  * JVM under different harness variants and prints per-run phase
  * times, so the per-entry overhead (query start, per-batch commit,
  * stop+cleanup, provider unload) is separable from data work and the
  * shared-warm-infrastructure levers can be chosen by measurement.
  *
  *   sbt "runMain graft.tools.ProbeFloor [sfDir] [reps]"
  */
object ProbeFloor {
  private def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // builder-time because Hadoop caches the file:// FileSystem
    // JVM-wide at first use — a session-level override never takes
    if (sys.env.get("SPARK_GRAFT_RAWFS").contains("true"))
      builder.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture once (mirrors the entry-level cache)
    val ss0 = graft.queries.StreamingQueries.streamSession(spark)
    val evs = graft.Tables.events(ss0, sfDir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"),
        col("event_type"), col("value"))
      .collect().map(r => EventsReplay.Ev(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq.sortBy(e => (e.tMs, e.eventId))
    val chunkDir = TempDir.create("graft-floor-chunks-")
    EventsReplay.chunks(evs, 3).zipWithIndex.foreach { case (c, i) =>
      EventsReplay.writeChunk(chunkDir.toString, i, c)
    }
    println(s"[floor] ${evs.size} events, 3 chunks")

    def runOnce(ss: SparkSession, unload: Boolean, label: String): Unit = {
      val t0 = System.nanoTime()
      val stream = EventsReplay.openStream(ss, chunkDir.toString)
      val name = "floor_" + UUID.randomUUID().toString.replace("-", "")
      val ckpt = TempDir.create("graft-floor-ckpt-")
      val tStart = System.nanoTime()
      val q = stream
        .withWatermark("ts", "60 seconds")
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .format("memory").queryName(name)
        .start()
      val startMs = ms(tStart)
      val tProc = System.nanoTime()
      q.processAllAvailable()
      val procMs = ms(tProc)
      val batches = q.recentProgress.map(p =>
        f"${p.batchId}:${p.durationMs.get("triggerExecution")}ms").mkString(" ")
      if (sys.env.get("SPARK_GRAFT_FLOOR_DETAIL").contains("true")) {
        import scala.jdk.CollectionConverters._
        q.recentProgress.foreach { p =>
          val det = p.durationMs.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"[floor]     batch ${p.batchId}: $det")
        }
      }
      val tStop = System.nanoTime()
      q.stop()
      val stopMs = ms(tStop)
      val tClean = System.nanoTime()
      TempDir.deleteRecursively(ckpt.toString)
      if (unload) StateStoreBridge.unloadAll()
      val cleanMs = ms(tClean)
      println(f"[floor] $label%-24s total ${ms(t0)}%7.0f ms  start $startMs%6.0f  " +
        f"process $procMs%7.0f  stop $stopMs%5.0f  clean $cleanMs%5.0f  batches: $batches")
      val _ = ss.sql(s"DROP TABLE IF EXISTS $name")
    }

    // A: production form — fresh session per run + unloadAll
    (1 to reps).foreach { i =>
      val ss = graft.queries.StreamingQueries.streamSession(spark)
      runOnce(ss, unload = true, s"A fresh+unload #$i")
    }
    // B: one shared warm session, still unloadAll per run
    val shared = graft.queries.StreamingQueries.streamSession(spark)
    (1 to reps).foreach(i => runOnce(shared, unload = true, s"B shared+unload #$i"))
    // C: shared session, NO unloadAll between runs
    (1 to reps).foreach(i => runOnce(shared, unload = false, s"C shared+keep   #$i"))
    StateStoreBridge.unloadAll()
    // D: shared session, no unload, async progress tracking
    val asyncSs = graft.queries.StreamingQueries.streamSession(spark)
    asyncSs.conf.set("spark.sql.streaming.asyncProgressTracking.enabled", "true")
    (1 to reps).foreach { i =>
      try runOnce(asyncSs, unload = false, s"D async-progress #$i")
      catch { case e: Exception => println(s"[floor] D failed: ${e.getMessage}") }
    }
    StateStoreBridge.unloadAll()
    // E: shared session with file:// mapped to RawLocalFileSystem —
    // the default checksummed LocalFileSystem writes a .crc shadow for
    // every WAL/state file; checkpoint IO on tmpfs may be paying that
    // double write per batch
    val rawSs = graft.queries.StreamingQueries.streamSession(spark)
    rawSs.conf.set("spark.hadoop.fs.file.impl",
      "org.apache.hadoop.fs.RawLocalFileSystem")
    (1 to reps).foreach { i =>
      try runOnce(rawSs, unload = true, s"E rawlocal-fs   #$i")
      catch { case e: Exception => println(s"[floor] E failed: ${e.getMessage}") }
    }
    StateStoreBridge.unloadAll()
    TempDir.deleteRecursively(chunkDir.toString)
    spark.stop()
  }
}
