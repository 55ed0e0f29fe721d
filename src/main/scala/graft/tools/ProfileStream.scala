package graft.tools

import java.util.UUID

import graft.streaming._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of the streaming replay harness (scratch tool):
  *   sbt "runMain graft.tools.ProfileStream [sfDir]"
  * Prints per-phase timings for the Update-mode upsert pipeline so the
  * fixed costs (query start, per-micro-batch commit, compaction) are
  * separable from data-proportional work.
  */
object ProfileStream {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

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
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()

    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "4"))
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      sys.env.getOrElse("SPARK_GRAFT_NODATA", "false"))
    // mirror streamSession's checkpoint-checksum default (env-A/B-able)
    ss.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      sys.env.get("SPARK_GRAFT_CKPT_CHECKSUM").contains("true").toString)
    // mirror streamSession's nio checkpoint manager (env-A/B-able)
    if (!sys.env.get("SPARK_GRAFT_CKPT_MANAGER").contains("default")) {
      ss.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.graftbridge.NioCheckpointFileManager")
    }

    val rides = t("collect rides") {
      TaxiReplay.ridesFromEvents(ss, sfDir).collect().toSeq
    }
    val ordered = t("serving order") { TaxiReplay.servingOrder(rides, 60000L) }
    println(s"[prof] n events = ${ordered.size}")

    // --- Update-mode total count through the upsert sink -----------
    val (ms, df) = TaxiReplay.memoryStream(ss)
    val sink = new KeyedUpsertSink(Seq("cell"))
    val ckpt = TempDir.create("graft-ckpt-")
    val q = t("query start") {
      TaxiPipelines.totalArrivalCount(df)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch(sink.upsert _)
        .start()
    }
    try {
      val size = math.max(1, math.ceil(ordered.size.toDouble / 4).toInt)
      ordered.grouped(size).zipWithIndex.foreach { case (b, i) =>
        ms.addData(b)
        t(s"micro-batch $i") { q.processAllAvailable() }
      }
      val out = t("compaction toDF") { sink.toDF(ss).localCheckpoint() }
      println(s"[prof] rows = ${out.count()}")
    } finally {
      t("stop+cleanup") {
        q.stop(); TempDir.deleteRecursively(ckpt.toString); sink.close()
        // same post-replay hygiene as the production harness — each
        // section must profile free of the previous one's stale
        // providers (see StateStoreBridge)
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      }
    }

    // --- Append-mode sliding for comparison ------------------------
    val (ms2, df2) = TaxiReplay.memoryStream(ss)
    val ckpt2 = TempDir.create("graft-ckpt-")
    val name = "prof_" + UUID.randomUUID().toString.replace("-", "")
    val q2 = t("sliding query start") {
      TaxiPipelines.slidingArrivalCount(df2)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt2.toString)
        .format("memory").queryName(name)
        .start()
    }
    try {
      // Mirror the production path (StreamingQueries.appendReplay): a
      // far-future zero-passenger sentinel rides with the last batch to
      // advance the watermark, then re-feeds alone as a 1-row flush
      // batch — with no-data micro-batches disabled, a bare
      // processAllAvailable() here runs NO batch at all, so the tail
      // panes would never emit and `sliding rows` would under-report.
      val sentinel = TaxiReplay.sentinelAfter(ordered)
      val fed = ordered :+ sentinel
      val size = math.max(1, math.ceil(fed.size.toDouble / 4).toInt)
      fed.grouped(size).zipWithIndex.foreach { case (b, i) =>
        ms2.addData(b)
        t(s"sliding micro-batch $i") { q2.processAllAvailable() }
      }
      t("sliding flush") { ms2.addData(Seq(sentinel)); q2.processAllAvailable() }
      println(s"[prof] sliding rows = ${ss.table(name).count()}")
      q2.recentProgress.foreach { p =>
        val dur = p.durationMs
        val st = p.stateOperators.headOption
        println(s"[prof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${dur.get("triggerExecution")} addBatch=${dur.get("addBatch")} " +
          s"getBatch=${dur.get("getBatch")} planning=${dur.get("queryPlanning")} " +
          s"walCommit=${dur.get("walCommit")} commitOffsets=${dur.get("commitOffsets")} " +
          st.map(s => s"stateCommit=${s.commitTimeMs} stateRows=${s.numRowsTotal} " +
            s"updated=${s.numRowsUpdated} mem=${s.memoryUsedBytes}").getOrElse(""))
      }
    } finally {
      t("sliding stop+cleanup") {
        q2.stop(); TempDir.deleteRecursively(ckpt2.toString)
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      }
    }

    // --- Stream-stream interval join (taxi_duration_stream shape) ---
    // The join keeps 4 state stores per partition (left/right ×
    // keyToNumValues/keyWithIndexToValue) and re-versions all of them
    // every micro-batch; this section attributes the cost. Full
    // progress JSON per batch — stateOperators carries per-store
    // commit times and row counts.
    val (ms3, df3) = TaxiReplay.memoryStream(ss)
    val ckpt3 = TempDir.create("graft-ckpt-")
    val name3 = "profdur_" + UUID.randomUUID().toString.replace("-", "")
    val q3 = t("duration query start") {
      TaxiPipelines.rideDurationJoin(df3)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt3.toString)
        .format("memory").queryName(name3)
        .start()
    }
    try {
      val size = math.max(1, math.ceil(ordered.size.toDouble / 2).toInt)
      ordered.grouped(size).zipWithIndex.foreach { case (b, i) =>
        ms3.addData(b)
        t(s"duration micro-batch $i") { q3.processAllAvailable() }
      }
      println(s"[prof] duration rows = ${ss.table(name3).count()}")
      q3.recentProgress.foreach(p => println(s"[prof] duration ${p.json}"))
    } finally {
      t("duration stop+cleanup") {
        q3.stop(); TempDir.deleteRecursively(ckpt3.toString)
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      }
    }
    spark.stop()
  }
}
