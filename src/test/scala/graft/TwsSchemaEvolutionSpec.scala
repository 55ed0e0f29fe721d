package graft

import graft.streaming.{EvoKV, EvoOut, EvoV1Processor, EvoV2Processor, TempDir}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.graftbridge.StateStoreBridge
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** STATE schema evolution across a streaming restart — the ops
  * capability `docs_schema_evolution` proves for at-rest parquet,
  * exercised for the live half: a transformWithState job whose state
  * class GAINS a field between incarnations keeps its checkpoint
  * (v1-written rows surface in v2 with the added Option field None,
  * sums intact, and the fold continues), when state rows are
  * Avro-encoded. Under the default UnsafeRow encoding the identical
  * restart must be REFUSED at/before first batch — the negative
  * control proving avro is what buys the capability, not lax
  * checking. At 100 TB this is the difference between evolving a
  * stateful job in place and re-ingesting history to rebuild state.
  */
class TwsSchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def session(encoding: String) = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.streaming.stateStore.encodingFormat", encoding)
    ss
  }

  private def run(encoding: String): (Map[Int, (Long, Long, Boolean)], Option[Throwable]) = {
    val ss = session(encoding)
    import ss.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val ms = MemoryStream[(Int, Long)]
    val ckpt = TempDir.create("graft-twsevo-")
    val emitted = new scala.collection.mutable.ArrayBuffer[(Long, EvoOut)]
    def start(v2: Boolean) = {
      val keyed = ms.toDF().toDF("k", "v").as[EvoKV].groupByKey(_.k)
      val out =
        if (v2) keyed.transformWithState(new EvoV2Processor(),
          TimeMode.None(), OutputMode.Update())
        else keyed.transformWithState(new EvoV1Processor(),
          TimeMode.None(), OutputMode.Update())
      out.toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = batch.as[EvoOut].collect().map(id -> _)
          emitted.synchronized { emitted ++= rows }
          ()
        }
        .start()
    }
    var failure: Option[Throwable] = None
    val q1 = start(v2 = false)
    try {
      ms.addData(Seq((1, 10L), (2, 5L)))
      q1.processAllAvailable()
      ms.addData(Seq((1, 7L)))
      q1.processAllAvailable()
    } finally {
      q1.stop()
      StateStoreBridge.unloadQuery(q1.runId)
    }
    // v1 left: key 1 -> sum 17, key 2 -> sum 5 (no mx anywhere)
    val before = emitted.synchronized(emitted.map(_._1).max)
    // The start() call itself lives inside the try: the UnsafeRow
    // state-schema refusal is allowed to surface at query start, not
    // only inside processAllAvailable, and either way it must land in
    // `failure` (for the negative control's assert) rather than escape
    // run() — and the checkpoint dir must be deleted on that path too.
    var q2: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q2 = start(v2 = true)
      ms.addData(Seq((1, 100L), (3, 2L)))
      q2.processAllAvailable()
    } catch { case t: Throwable => failure = Some(t) }
    finally {
      if (q2 != null) {
        q2.stop()
        StateStoreBridge.unloadQuery(q2.runId)
      }
      TempDir.deleteRecursively(ckpt.toString)
    }
    val resumed = emitted.synchronized(
      emitted.filter(_._1 > before).map { case (_, o) =>
        o.k -> ((o.sum, o.mx, o.legacy))
      }.toMap)
    (resumed, failure)
  }

  test("avro-encoded state evolves in place: v1 rows surface with the added field null") {
    val (resumed, failure) = run("avro")
    assert(failure.isEmpty, s"avro restart must succeed, got: $failure")
    // key 1: v1 sum 17 + 100, and the seam is VISIBLE — prior state
    // had no mx (legacy=true), the new fold starts the tracker at 100
    assert(resumed.get(1).contains((117L, 100L, true)), s"key 1: $resumed")
    // key 3 is born under v2: not legacy
    assert(resumed.get(3).contains((2L, 2L, false)), s"key 3: $resumed")
  }

  test("UnsafeRow-encoded state refuses the same evolution (the negative control)") {
    val (resumed, failure) = run("unsaferow")
    assert(failure.isDefined,
      s"unsaferow restart with a widened state class must fail, emitted: $resumed")
    val msg = failure.get.toString +
      Option(failure.get.getCause).map(_.toString).getOrElse("")
    assert(msg.toUpperCase.contains("SCHEMA"),
      s"failure should be the state-schema check, got: $msg")
  }
}
