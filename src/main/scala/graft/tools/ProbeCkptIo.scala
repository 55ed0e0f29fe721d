package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scratch probe: where does the ~40 ms per streaming-WAL write go on
  * tmpfs? Times, per layer, 50 iterations of a small create+rename:
  *   (a) raw java.nio write + ATOMIC_MOVE          (the hardware floor)
  *   (b) Hadoop FileContext create + rename        (what the default
  *       FileContextBasedCheckpointFileManager uses)
  *   (c) CheckpointFileManager.createAtomic        (the actual WAL path,
  *       checksum manager included when enabled)
  *   sbt "runMain graft.tools.ProbeCkptIo"
  */
object ProbeCkptIo {
  private def time(label: String, n: Int)(body: Int => Unit): Unit = {
    val t0 = System.nanoTime()
    (0 until n).foreach(body)
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"[ckptio] $label%-42s total ${ms}%8.1f ms   per-op ${ms / n}%7.2f ms")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.streaming.TempDir.create("graft-ckptio-")
    val payload = ("x" * 200).getBytes("UTF-8")
    val n = 50

    time("java.nio write+fsync+ATOMIC_MOVE", n) { i =>
      val tmp = Paths.get(dir.toString, s"nio-$i.tmp")
      val dst = Paths.get(dir.toString, s"nio-$i")
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      ch.write(java.nio.ByteBuffer.wrap(payload)); ch.force(true); ch.close()
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    }

    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new java.net.URI(s"file://$dir"), new Configuration())
    time("FileContext create+write+close only", n) { i =>
      val tmp = new Path(s"file://$dir/fca-$i.tmp")
      val out = fc.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
      out.write(payload); out.close()
    }
    time("FileContext hsync (open+write+hsync+close)", n) { i =>
      val tmp = new Path(s"file://$dir/fcb-$i.tmp")
      val out = fc.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
      out.write(payload); out.hsync(); out.close()
    }
    time("FileContext rename only", n) { i =>
      fc.rename(new Path(s"file://$dir/fcb-$i.tmp"),
        new Path(s"file://$dir/fcb-$i"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    time("FileContext getFileStatus", n) { i =>
      fc.getFileStatus(new Path(s"file://$dir/fcb-$i"))
    }
    time("FileContext create with permission", n) { i =>
      val tmp = new Path(s"file://$dir/fcc-$i.tmp")
      val out = fc.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE),
        org.apache.hadoop.fs.Options.CreateOpts.perms(
          new org.apache.hadoop.fs.permission.FsPermission("644")))
      out.write(payload); out.close()
    }

    val conf = spark.sessionState.newHadoopConf()
    Seq(false, true).foreach { checksum =>
      spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", checksum.toString)
      val base = new Path(s"file://$dir/cfm-$checksum")
      fc.mkdir(base, org.apache.hadoop.fs.permission.FsPermission.getDirDefault, true)
      val cfm = org.apache.spark.sql.execution.streaming.checkpointing
        .CheckpointFileManager.create(base, conf)
      time(s"CheckpointFileManager.createAtomic cs=$checksum", n) { i =>
        val out = cfm.createAtomic(
          new Path(s"file://$dir/cfm-$checksum/f-$i"), overwriteIfPossible = true)
        out.write(payload); out.close()
      }
      time(s"CheckpointFileManager exists() cs=$checksum", n) { i =>
        cfm.exists(new Path(s"file://$dir/cfm-$checksum/f-$i"))
      }
    }

    graft.streaming.TempDir.deleteRecursively(dir.toString)
    spark.stop()
  }
}
