package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** O14: keyed idempotent upsert sink
  * (reference `sinks/ElasticsearchUpsertSink.scala:42-81`).
  *
  * The semantic contract the reference relies on: the sink is *keyed*
  * and *idempotent* — re-emissions of a key overwrite, so Update-mode
  * per-micro-batch emission converges to the same state as Flink's
  * per-record emission (SURVEY.md §7 decision log).
  *
  * This in-memory implementation backs local demos/tests (the
  * reference's ES sink is equally a single-connection per-record
  * writer). At cluster scale the identical contract is a
  * `foreachBatch` keyed MERGE into a transactional table or a KV
  * store with last-write-wins per key — the pipeline code is unchanged,
  * only the `upsert` callback body.
  */
final class KeyedUpsertSink(keyCols: Seq[String]) extends Serializable {

  private val state = new java.util.concurrent.ConcurrentHashMap[Seq[Any], Row]()
  @volatile private var schema: StructType = _

  /** `foreachBatch` callback: last-write-wins per key. */
  def upsert(batch: Dataset[Row], batchId: Long): Unit = {
    if (schema == null) schema = batch.schema
    batch.collect().foreach { row =>
      state.put(keyCols.map(c => row.getAs[Any](c)), row)
    }
  }

  def toDF(spark: SparkSession): DataFrame = {
    require(schema != null, "upsert sink received no batches")
    spark.createDataFrame(state.values.asScala.toList.asJava, schema)
  }

  def size: Int = state.size()
}
