package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loader for the driver's parquet test tables
  * (see /root/repo/TESTDATA.md). Every query reads through here so the
  * parquet scan options stay consistent (vectorized reader, pushdown).
  *
  * At 100 TB these tables would be partitioned directories instead of
  * single files; `spark.read.parquet` handles both transparently, and
  * all downstream operators rely only on column pruning + predicate
  * pushdown (visible in `.explain("formatted")` as ReadSchema /
  * PushedFilters), never on physical layout.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Child session that STARTS FROM the parent's runtime conf (a bare
    * `newSession()` resets to the SparkContext's initial conf,
    * silently dropping anything the caller — or a spec — set at
    * runtime, e.g. AQE toggles). Used to scope plan-affecting flags
    * to one query without mutating the shared session: the flag must
    * outlive the builder (plans resolve lazily at execution), so a
    * save/restore can't do this, but a session the returned frame is
    * bound to can. Static confs can't be re-set and are skipped.
    */
  def scopedSession(parent: SparkSession): SparkSession = {
    val s = parent.newSession()
    parent.conf.getAll.foreach { case (k, v) =>
      try s.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    s
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `events.ts` is microsecond-precision parquet TIMESTAMP. All
    * event-time logic standardizes on *millisecond* precision — the
    * reference's native unit (Flink event time is epoch millis,
    * `sources/TaxiRideSource.scala:116`) — via `date_trunc`, which for
    * the fixture's post-epoch timestamps is the same floor the DuckDB
    * oracles compute with `epoch_ms(date_trunc('millisecond', ts))`,
    * so Spark and the oracle agree bit-for-bit.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts", date_trunc("millisecond", col("ts")))
}
