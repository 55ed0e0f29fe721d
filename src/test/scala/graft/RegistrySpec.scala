package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants: the driver's correctness gate checks exactly
  * the (queries, oracleSql) pairs, and an entry present in only one
  * map silently degrades (query without oracle → weak rows-only
  * check; oracle without query → dead SQL). The surface's stated
  * property — zero rows-only checks anywhere — is pinned here rather
  * than re-asserted in prose.
  */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has a full DuckDB oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("no oracle leaves an integer SUM uncast to a wide type (HUGEINT class)") {
    // The r10 lesson, statically: DuckDB's SUM(BIGINT) returns
    // HUGEINT, which the driver's type-sensitive hash rejects. The
    // exact check is tools/check.py's DESCRIBE lint (DuckDB-bound);
    // this static guard catches the obvious recurrence — a SUM(
    // window or plain) in the FINAL select list that is not wrapped
    // in a CAST — without needing DuckDB on the sbt classpath.
    // Heuristic by design: the lint is the gate, this is the tripwire.
    val suspicious = SparkEntry.oracleSql.filter { case (_, sql) =>
      val finalSelect = sql.lastIndexOf("SELECT")
      val tail = sql.substring(finalSelect)
      // an uncast sum aliased directly in the final projection
      raw"(?i)(?<!CAST\()\bsum\s*\([^)]*\)\s+AS\s+\w+".r
        .findFirstIn(tail)
        .exists(m => !tail.substring(0, tail.indexOf(m)).endsWith("CAST("))
    }
    // entries whose final-select SUM is provably safe: DECIMAL/DOUBLE
    // sums (not integer), or sums the driver verified green in
    // CORRECTNESS_r10 (their result type is not wide)
    val reviewed = Set(
      "q1_pricing_summary", "q3_join_agg", "q4_lineitem_orders",
      "q7_rollup", "q9_orders_by_month", "q11_cube", "q14_grouping_sets",
      "q15_histogram", "q22_share_of_total", "events_ab_test",
      "events_rolling_value", "events_winsorized", "taxi_od_matrix",
      "events_enrich_stream", "events_sessionize_stream")
    val hits = suspicious.keySet -- reviewed
    assert(hits.isEmpty,
      s"possible uncast integer SUM in final select (run tools/check.py --lint-only to confirm): ${hits.toSeq.sorted}")
  }
}
