package graft

import graft.queries.EventQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `events_ohlc`'s selection semantics, recomputed by brute force
  * per (type, hour) group on the driver: open/close are the values at
  * the group's (t_ms, event_id)-first/last events, high/low its
  * extremes — pure selections, so every output double is bit-equal to
  * an input double (no float arithmetic anywhere in the entry).
  */
class OhlcResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bars equal the brute-force per-group selection") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), unix_millis(col("ts")).as("t_ms"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows
      .groupBy { case (t, ms, _, _) => (t, ms / EventQueries.HourMs * EventQueries.HourMs) }
      .map { case (key, g) =>
        val sorted = g.sortBy { case (_, ms, id, _) => (ms, id) }
        key -> ((sorted.head._4, g.map(_._4).max, g.map(_._4).min,
          sorted.last._4, g.length.toLong))
      }
    val got = EventQueries.queries("events_ohlc")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(got == expected, "OHLC bars drifted from the brute-force selection")
    // every bar is non-degenerate in the obvious ways
    got.values.foreach { case (open, high, low, close, n) =>
      assert(low <= high && open >= low && open <= high &&
        close >= low && close <= high && n > 0)
    }
  }
}
