package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** Ephemeral local scratch dirs for the replay harness (streaming
  * checkpoints, upsert logs).
  *
  * Placement: tmpfs (`/dev/shm`) when available — the default temp dir
  * can sit on a slow filesystem (9p in containers) and the state store
  * writes delta + snapshot files per operator per partition per
  * micro-batch, so checkpoint IO otherwise dominates replay time.
  *
  * Cleanup is as important as placement: tmpfs is RAM, so every leaked
  * checkpoint competes with the page cache. Per-query bench deltas on
  * frozen code (r3 vs r4) showed disjoint 2–4× excursions consistent
  * with run-to-run noise, plausibly amplified by accumulated litter —
  * so every creator must pair with a `deleteRecursively` in a
  * `finally`, and back-to-back bench runs on a clean tmpfs (SCALE.md)
  * are the variance reference.
  */
object TempDir {

  /** Create a scratch dir under tmpfs when possible. */
  def create(prefix: String): Path = {
    val base = Paths.get("/dev/shm")
    if (Files.isDirectory(base) && Files.isWritable(base))
      Files.createTempDirectory(base, prefix)
    else Files.createTempDirectory(prefix)
  }

  /** Best-effort recursive delete; never throws (cleanup must not mask
    * the primary failure in a `finally`).
    */
  def deleteRecursively(dir: String): Unit =
    try {
      val root = Paths.get(dir)
      if (Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        Files.walk(root).iterator().asScala.toSeq.reverseIterator
          .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }
}
