package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical probes of the engine conventions the oracles' arithmetic
  * mirrors — each one a boundary the fixtures' random-derived
  * timestamps essentially never sample, pinned here so an engine
  * upgrade that shifts a convention fails a named test instead of
  * silently diverging from 200 oracle spellings. (Session-window's
  * INCLUSIVE merge boundary — the one that actually bit — is pinned
  * by `DynamicSessionSpec`.)
  */
class EngineConventionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("tumbling window() panes are half-open: an event at exactly pane end belongs to the NEXT pane") {
    import spark.implicits._
    // the convention behind every `t_ms div paneMs` oracle spelling
    val got = Seq(899999L, 900000L).toDF("t_ms")
      .select(col("t_ms"),
        unix_millis(window(timestamp_millis(col("t_ms")), "15 minutes")("start"))
          .as("w_start"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(899999L) == 0L, "pre-boundary event left its pane")
    assert(got(900000L) == 900000L, "boundary event did not roll to the next pane")
  }

  test("sliding window() membership at a slide boundary: exactly size/slide panes, the newest starting AT the event") {
    import spark.implicits._
    // 15-min window, 5-min slide, event at t = 11 * 5 min exactly:
    // half-open panes give starts {t-10min, t-5min, t}
    val t = 3300000L
    val panes = Seq(t).toDF("t_ms")
      .groupBy(window(timestamp_millis(col("t_ms")), "15 minutes", "5 minutes").as("w"))
      .count()
      .select(unix_millis(col("w.start")))
      .collect().map(_.getLong(0)).sorted
    assert(panes.toSeq == Seq(t - 600000L, t - 300000L, t),
      s"unexpected pane starts: ${panes.mkString(",")}")
  }

  test("epoch alignment: window() pane starts are multiples of the slide from the epoch") {
    import spark.implicits._
    // the convention that makes `div`-arithmetic oracles valid at all
    val starts = Seq(1234567L, 987654321L).toDF("t_ms")
      .groupBy(window(timestamp_millis(col("t_ms")), "15 minutes", "5 minutes").as("w"))
      .count()
      .select(unix_millis(col("w.start")))
      .collect().map(_.getLong(0))
    assert(starts.forall(_ % 300000L == 0), s"non-epoch-aligned starts: ${starts.mkString(",")}")
  }
}
