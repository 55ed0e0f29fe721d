package graft.streaming

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
    * the value struct on batch id — a single hash aggregation with
    * map-side partial reduction, vs the `row_number` window form that
    * shuffles every log row and sorts each key's history. Ties (a
    * replayed batch re-appending identical rows under the same batch
    * id) are safe: the tied rows are identical by construction.
    */
  def toDF(spark: SparkSession): DataFrame = {
    val log = spark.read.parquet(logPath)
    val valueCols = log.columns.filterNot(c => keyCols.contains(c) || c == "_batch_id")
    log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col("_batch_id")).as("_v"))
      .select(log.columns.filterNot(_ == "_batch_id").map(c =>
        if (keyCols.contains(c)) col(c) else col(s"_v.`$c`").as(c)): _*)
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
