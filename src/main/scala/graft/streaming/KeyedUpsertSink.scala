package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** O14: keyed idempotent upsert sink
  * (reference `sinks/ElasticsearchUpsertSink.scala:42-81`).
  *
  * The semantic contract the reference relies on: the sink is *keyed*
  * and *idempotent* — re-emissions of a key overwrite, so Update-mode
  * per-micro-batch emission converges to the same state as Flink's
  * per-record emission (SURVEY.md §7 decision log).
  *
  * Implementation is an *upsert log with merge-on-read compaction* —
  * the shape a keyed external store takes on Spark at scale:
  *
  *  - `upsert` (the `foreachBatch` callback) appends the micro-batch
  *    to a parquet log, stamped with the batch id. The write is
  *    executor-parallel and touches nothing but the new rows — no
  *    driver collect, no read-modify-write of existing state, so
  *    per-batch cost stays O(batch), independent of accumulated keys.
  *  - `toDF` compacts: last write (max `_batch_id`) wins per key — one
  *    shuffle on the key columns. Re-run batches (foreachBatch replays
  *    after failure) dedupe away because a replayed batch re-appends
  *    identical rows under the same batch id.
  *
  * At 100 TB the log lives on the object store partitioned by batch id
  * and compaction runs either at read (this form) or periodically
  * folding the log into a base table; the pipeline code is unchanged.
  */
final class KeyedUpsertSink(keyCols: Seq[String], logPath: String)
    extends Serializable {

  def this(keyCols: Seq[String]) =
    this(keyCols, KeyedUpsertSink.tempLogDir())

  /** `foreachBatch` callback: executor-side append of the micro-batch
    * to the keyed upsert log.
    */
  def upsert(batch: Dataset[Row], batchId: Long): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write.mode("append").parquet(logPath)

  /** Current state: last-write-wins per key over the log. `max_by` of
    * the value struct on batch id — a single aggregation with
    * map-side partial reduction, vs the `row_number` window form that
    * shuffles every log row and sorts each key's history. (Spark
    * plans the `max_by` as SortAggregate, not HashAggregate — struct
    * buffers fail `UnsafeRow.isMutable` — but the sorts are local
    * over narrow pre-reduced rows; what matters at scale is that
    * only one row per key per map partition crosses the exchange,
    * same as `text_curation_pipeline`.) Ties (a
    * replayed batch re-appending identical rows under the same batch
    * id) are safe: the tied rows are identical by construction.
    * Degenerate all-key schema (no value columns): last-write-wins
    * reduces to key dedup — `max_by(struct())` would fail analysis.
    */
  def toDF(spark: SparkSession): DataFrame =
    fold(spark.read.parquet(logPath))

  private def fold(log: DataFrame): DataFrame = {
    val valueCols = log.columns.filterNot(c => keyCols.contains(c) || c == "_batch_id")
    if (valueCols.isEmpty) log.dropDuplicates(keyCols).drop("_batch_id")
    else log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col("_batch_id")).as("_v"))
      .select(log.columns.filterNot(_ == "_batch_id").map(c =>
        if (keyCols.contains(c)) col(c) else col(s"_v.`$c`").as(c)): _*)
  }

  /** Fold the accumulated log into a compacted base — the periodic
    * MERGE a keyed store runs at scale so read cost stops growing with
    * total batches ever written. A snapshot of the current log files is
    * folded (last-write-wins), written back stamped with the snapshot's
    * max `_batch_id`, and only the consumed files are deleted — appends
    * that race the compaction survive untouched, and the add-before-
    * delete ordering makes a crash mid-compact safe (leftover consumed
    * files are duplicates that fold away idempotently: the compacted
    * row carries the same batch id and, by last-write-wins, the same
    * value as the newest row it replaced). `toDF` is unchanged — it
    * keeps folding whatever files exist.
    *
    * File manipulation is `java.nio` — valid for the local/tmpfs log
    * dirs this sink targets (see `tempLogDir`). On shared object
    * storage the same fold becomes a transactional MERGE INTO /
    * rewrite on the table format (Delta/Iceberg), not raw file moves;
    * the pipeline code above this seam is unchanged either way.
    */
  def compact(spark: SparkSession): Unit = {
    val dir = java.nio.file.Paths.get(logPath)
    if (!java.nio.file.Files.isDirectory(dir)) return
    val consumed = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toVector
      finally s.close()
    }
    if (consumed.isEmpty) return
    // strictly increasing generation number keeps new file names
    // disjoint from every consumed file (including prior compact
    // output), so add-before-delete never collides with itself
    val gen = consumed.flatMap(f =>
      "compact-g(\\d+)-".r.findFirstMatchIn(f.getFileName.toString)
        .map(_.group(1).toInt)).maxOption.getOrElse(0) + 1
    val snapshot = spark.read.parquet(consumed.map(_.toString): _*)
    // a log holding only zero-row files (an empty micro-batch still
    // writes a schema-only parquet file) has nothing to fold — and
    // max(_batch_id) would be null. Leave the files; they carry the
    // schema toDF needs on an otherwise-empty log.
    val maxBatchRow = snapshot.agg(max(col("_batch_id"))).head()
    if (maxBatchRow.isNullAt(0)) return
    val maxBatch = maxBatchRow.getLong(0)
    val tmp = TempDir.create("graft-compact-")
    try {
      fold(snapshot)
        .withColumn("_batch_id", lit(maxBatch))
        .write.mode("overwrite").parquet(tmp.resolve("base").toString)
      val baseFiles = {
        val s = java.nio.file.Files.list(tmp.resolve("base"))
        try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toVector
        finally s.close()
      }
      baseFiles.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.move(f, dir.resolve(f"compact-g$gen%05d-$i%05d.parquet"))
      }
      consumed.foreach(java.nio.file.Files.deleteIfExists(_))
    } finally TempDir.deleteRecursively(tmp.toString)
  }

  def size(spark: SparkSession): Long = toDF(spark).count()

  /** Delete the ephemeral log dir. Call after the compacted state has
    * been materialized (e.g. `toDF(...).localCheckpoint()`) — `toDF`
    * itself is lazy over the log files.
    */
  def close(): Unit = TempDir.deleteRecursively(logPath)
}

object KeyedUpsertSink {
  /** Default log dir on driver-local tmpfs — same rationale as
    * streaming checkpoints (9p container filesystems make
    * many-small-file IO the bottleneck, and the replay-harness log is
    * ephemeral). NOTE: a driver-local path is only executor-reachable
    * in local mode (or with a shared filesystem); on a real cluster the
    * "executor-parallel append" property requires routing `logPath` to
    * shared storage (object store / DFS) via the primary constructor.
    */
  private def tempLogDir(): String = {
    val dir = TempDir.create("graft-upsert-")
    // parquet append wants the dir to not pre-exist
    java.nio.file.Files.delete(dir)
    dir.toString
  }
}
