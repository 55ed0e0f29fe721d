package graft.tools

import scala.collection.mutable

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage spill/shuffle attribution for one named query (scratch
  * tool — judge VERDICT r14 item 3 / r15 item 8: WHERE does
  * dedup_kcore spill at sf10, and which knob flattens it):
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  *   sbt "runMain graft.tools.ProbeSpill dedup_kcore /tmp/graft_sf10"
  *
  * Prints one row per completed stage: duration, task count, input /
  * shuffle-read / shuffle-write bytes, and memory/disk spill — sorted
  * by spill so the offending exchange is the first line.
  */
object ProbeSpill {
  final case class StageRow(
      id: Int, name: String, tasks: Int, durMs: Long,
      inputMB: Double, srMB: Double, swMB: Double,
      spillMemMB: Double, spillDiskMB: Double, peakExecMemMB: Double)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        def mb(b: Long) = b / 1024.0 / 1024.0
        rows.synchronized {
          rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            mb(m.inputMetrics.bytesRead),
            mb(m.shuffleReadMetrics.totalBytesRead),
            mb(m.shuffleWriteMetrics.bytesWritten),
            mb(m.memoryBytesSpilled), mb(m.diskBytesSpilled),
            mb(m.peakExecutionMemory))
        }
      }
    })
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    rows.synchronized(rows.clear())
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[spill] $name: $sec%.1f s, $n rows, ${rows.size} stages")
    val all = rows.synchronized(rows.toSeq)
    val interesting = all.sortBy(r => -(r.spillMemMB + r.spillDiskMB))
    println(f"[spill] ${"stage"}%6s ${"tasks"}%5s ${"dur_ms"}%8s ${"input"}%9s ${"sh_read"}%9s ${"sh_write"}%9s ${"spill_mem"}%10s ${"spill_disk"}%10s ${"peak_exec"}%10s  name")
    interesting.take(25).foreach { r =>
      println(f"[spill] ${r.id}%6d ${r.tasks}%5d ${r.durMs}%8d ${r.inputMB}%9.1f ${r.srMB}%9.1f ${r.swMB}%9.1f ${r.spillMemMB}%10.1f ${r.spillDiskMB}%10.1f ${r.peakExecMemMB}%10.1f  ${r.name}")
    }
    val totSpill = all.map(r => r.spillMemMB + r.spillDiskMB).sum
    println(f"[spill] TOTAL spill ${totSpill}%.1f MB over ${all.count(r => r.spillMemMB + r.spillDiskMB > 0)} spilling stages")
    spark.stop()
  }
}
