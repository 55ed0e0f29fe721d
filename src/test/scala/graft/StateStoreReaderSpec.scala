package graft

import graft.queries.StreamingQueries
import graft.streaming.{CellEvent, EventsReplay, TempDir, TwsTotalCount}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.StateStoreBridge
import org.scalatest.funsuite.AnyFunSuite

/** The `events_state_reader` oracle entry pins that state CONTENT
  * equals the batch aggregate; this spec pins the half the oracle
  * cannot see — the `state-metadata` companion source (operator
  * identity, store name, partitioning, batch range) and the reader's
  * per-partition shape. These are the coordinates an operator on call
  * uses to aim the state reader at the right store of a multi-operator
  * 100 TB job before reading a single row.
  */
class StateStoreReaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("state-metadata names the agg store; statestore rows cover its partitions") {
    val ss = StreamingQueries.streamSession(spark)
    val evs = Tables.events(ss, sf)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"),
        col("event_type"), col("value"))
      .collect().map(r => EventsReplay.Ev(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq.sortBy(e => (e.tMs, e.eventId))
    val nChunks = 3
    val (stream, chunkDir) = EventsReplay.fileStream(ss, evs, nChunks = nChunks)
    val ckpt = TempDir.create("graft-ckpt-")
    val q = stream.groupBy(col("etype")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .format("noop")
      .start()
    try {
      q.processAllAvailable()
      q.stop()

      val md = ss.read.format("state-metadata").load(ckpt.toString).collect()
      assert(md.length == 1, "one stateful operator -> one metadata row")
      val row = md(0)
      assert(row.getAs[String]("operatorName") == "stateStoreSave",
        "streaming agg state lives in the stateStoreSave operator")
      assert(row.getAs[String]("stateStoreName") == "default")
      val nParts = ss.conf.get("spark.sql.shuffle.partitions").toInt
      assert(row.getAs[Int]("numPartitions") == nParts,
        "state is partitioned by the session's shuffle partitions at first batch")
      // one micro-batch per chunk (maxFilesPerTrigger=1, no-data
      // batches disabled in streamSession)
      assert(row.getAs[Long]("minBatchId") == 0L)
      assert(row.getAs[Long]("maxBatchId") == (nChunks - 1).toLong)

      val st = ss.read.format("statestore").load(ckpt.toString)
      val partIds = st.select(col("partition_id")).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(partIds.subsetOf((0 until nParts).toSet),
        "reader exposes the store's physical partitioning")
      // content equals the batch aggregate (the oracle pins this at
      // sf0.01 through the DuckDB gate; re-pinned here so the spec
      // stands alone)
      val got = st.select(col("key.etype"), col("value.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Tables.events(ss, sf).groupBy(col("event_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, "state rows must BE the aggregate")

      // STATE TIME TRAVEL: option("batchId", 0) reads the store as it
      // stood after the FIRST micro-batch — i.e. the aggregate of
      // chunk 0 alone (the replay chunking is deterministic, so the
      // expected snapshot is computable). This is the post-incident
      // surface: "what did the state look like before batch N
      // corrupted it", against the same checkpoint, no restore.
      val st0 = ss.read.format("statestore")
        .option("batchId", 0).load(ckpt.toString)
        .select(col("key.etype"), col("value.count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // chunk 0 = micro-batch 0 by EventsReplay's exposed assignment
      // (chunks), not a re-derivation of its ceil-division
      val want0 = EventsReplay.chunks(evs, nChunks).head.groupBy(_.etype)
        .map { case (t, es) => t -> es.size.toLong }
      assert(st0 == want0,
        s"batchId=0 must snapshot chunk 0's aggregate: $st0 vs $want0")
      assert(st0.values.sum < got.values.sum,
        "the early snapshot must be a strict prefix of the final state")
    } finally {
      if (q.isActive) q.stop()
      TempDir.deleteRecursively(ckpt.toString)
      TempDir.deleteRecursively(chunkDir)
      StateStoreBridge.unloadAll()
    }
  }

  /** The new-API half: transformWithState stores NAMED state
    * variables, and the reader addresses one with `stateVarName` —
    * the surface an operator uses to inspect a TWS job's ValueState
    * without code changes to the job. The read-back state must equal
    * the fold the processor ran.
    */
  test("transformWithState named ValueState reads back via stateVarName") {
    val ss = StreamingQueries.streamSession(spark)
    // transformWithState requires the RocksDB provider (the harness
    // flips it per-session exactly like the TWS entries do)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val evs = Seq(
      CellEvent(1, 1L, t(1000), 2), CellEvent(1, 2L, t(2000), 3),
      CellEvent(2, 3L, t(1500), 5), CellEvent(3, 4L, t(900), 1),
      CellEvent(3, 5L, t(2500), 4))
    val srcDir = TempDir.create("graft-tws-src-")
    val ckpt = TempDir.create("graft-ckpt-")
    evs.toDS().write.mode("overwrite").parquet(srcDir.toString)
    val stream = ss.readStream.schema(evs.toDS().schema)
      .parquet(srcDir.toString).as[CellEvent]
    val q = TwsTotalCount.totalCountTws(stream).toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .format("noop").start()
    try {
      q.processAllAvailable()
      q.stop()
      val st = ss.read.format("statestore")
        .option("stateVarName", "total").load(ckpt.toString)
      val got = st.select(col("key.*"), col("value.*")).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = evs.groupBy(_.cell).map { case (c, es) =>
        c -> (es.map(_.passengers.toLong).sum, es.map(_.ts.getTime).max)
      }
      assert(got == want,
        s"TWS ValueState must BE the processor's fold: got $got want $want")
    } finally {
      if (q.isActive) q.stop()
      TempDir.deleteRecursively(ckpt.toString)
      TempDir.deleteRecursively(srcDir.toString)
      StateStoreBridge.unloadAll()
    }
  }
}
