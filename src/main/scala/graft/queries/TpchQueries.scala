package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational aggregation + join queries over the TPC-H-ish driver
  * tables. These exercise the batch engine spine the reference's
  * pipelines reduce to (scan → filter → project → shuffle → agg), plus
  * the join surface the reference lacks but any engine user needs
  * (SURVEY.md §2.1 "Joins: absent").
  *
  * Oracle-parity rules used throughout:
  *  - double aggregations go through DECIMAL(18,4) so the sum is exact
  *    and order-independent, then cast back to DOUBLE — Spark partial
  *    aggregation order and DuckDB's order then cannot diverge;
  *  - every computed column is aliased identically in the Spark plan
  *    and the oracle SQL (driver hash sorts columns by name).
  */
object TpchQueries {

  /** Exact, order-insensitive sum of a double column: sum in decimal,
    * return double. Codegen-friendly (no UDF).
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Recursive-CTE month spine + gap-fill, parameterized only by the
    * orders table name: BOTH engines run this text verbatim (Spark via
    * `spark.sql`, DuckDB as the oracle) — the strongest SQL-front-door
    * parity form in the registry, one character of divergence would
    * fail the hash. The recursion generates the calendar spine from
    * MIN to MAX o_orderdate; the LEFT JOIN against a deliberately
    * sparse subset (o_orderkey % 1024 = 0) gap-fills absent months
    * with 0 (67/80 at sf0.01) — the report shape every time-series
    * dashboard needs and bare GROUP BY cannot produce (absent months
    * yield no groups).
    *
    * Recursion granularity is a DISTRIBUTED-ENGINE design decision,
    * measured: Spark executes each recursion level as a scheduled job
    * (~0.2 s/step at local[32]) and re-evaluates the recursive
    * member's `bounds` join — a month-level spine (80 steps) cost
    * 16 s at sf0.1 for 80 rows. The shipped form recurses at YEAR
    * granularity (7 steps) and fans the 12 months out relationally
    * (a VALUES cross join) — 2.4 s warm, same result, same verbatim
    * parity. The lesson generalizes: in an engine whose iteration
    * unit is a job, recurse at the coarsest correct granularity and
    * let relational fan-out do the rest (the CC/PageRank/BFS
    * operators apply the same rule via pointer-jumping supersteps).
    * Depth is a property of the date DOMAIN, not the row count, so it
    * does not grow with SF (7 levels, under the default 100 limit).
    */
  private def monthSpineSql(table: String): String =
    s"""WITH RECURSIVE bounds AS (
       |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
       |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
       |  FROM $table),
       |years(y) AS (
       |  SELECT CAST(date_trunc('year', lo) AS DATE) FROM bounds
       |  UNION ALL
       |  SELECT CAST(y + INTERVAL '1' YEAR AS DATE) FROM years, bounds
       |  WHERE y < CAST(date_trunc('year', hi) AS DATE)),
       |offsets(k) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11)),
       |clipped AS (
       |  SELECT CAST(y + k * INTERVAL '1' MONTH AS DATE) AS m
       |  FROM years, offsets, bounds
       |  WHERE CAST(y + k * INTERVAL '1' MONTH AS DATE) >= lo
       |    AND CAST(y + k * INTERVAL '1' MONTH AS DATE) <= hi),
       |sparse AS (
       |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS n
       |  FROM $table WHERE o_orderkey % 1024 = 0 GROUP BY 1)
       |SELECT s.m AS month, COALESCE(c.n, 0) AS n_orders
       |FROM clipped s LEFT JOIN sparse c ON s.m = c.m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: the canonical scan→filter→partial-agg→final-agg
    // pipeline. Filter + projection reach the parquet scan via Catalyst.
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Broadcast-join chain: orders ⋈ customer ⋈ nation ⋈ region.
    // customer/nation/region are dimension-sized → Spark auto-broadcasts
    // (and we hint it explicitly so the plan survives a 100× fact-table
    // scale-up without flipping to sort-merge).
    "q3_join_agg" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nation = Tables.nation(s, dir)
      val region = Tables.region(s, dir)
      orders
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"), col("c_mktsegment"))
        .agg(
          dsum(col("o_totalprice")).as("total_price"),
          count(lit(1)).as("n_orders"))
    }),

    // Fact-fact join (lineitem ⋈ orders on orderkey): the one genuinely
    // shuffling join at scale. Both sides hash-partition on the key;
    // AQE handles skew. Filter on o_orderstatus pushes below the join.
    "q4_lineitem_orders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val orders = Tables.orders(s, dir).filter(col("o_orderstatus") === lit("F"))
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("revenue"))
    }),

    // Semi/anti join surface: customers with and without orders.
    "q5_semi_anti" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val orders = Tables.orders(s, dir).select(col("o_custkey"))
      val withO = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
        .select(lit("with_orders").as("bucket"), col("c_acctbal"))
      val withoutO = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
        .select(lit("no_orders").as("bucket"), col("c_acctbal"))
      withO.unionAll(withoutO)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
    }),

    // Top-k per group via window function (rank over partition) — the
    // reference delegates ranking to Kibana (SURVEY §2.1); we implement
    // it natively. Window partitions by returnflag → single shuffle.
    "q6_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
      val byOrder = li.groupBy(col("l_returnflag"), col("l_orderkey"))
        .agg(dsum(col("l_extendedprice")).as("order_rev"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("order_rev").desc, col("l_orderkey").asc)
      byOrder.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("l_returnflag"), col("l_orderkey"), col("order_rev"), col("rnk"))
    }),

    // Grouping sets / rollup: free in Catalyst, absent in the reference
    // (SURVEY §2.1 "Aggregations").
    "q7_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    }),

    // Full grouping-sets surface: cube = rollup + the column-wise
    // marginals (the (∅, linestatus) sets rollup omits). Same
    // two-phase aggregate; output rows = Π(card+1), input-independent.
    "q11_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    }),

    // Date-function surface: truncate order dates to month buckets.
    "q9_orders_by_month" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    }),

    // Exact interpolated percentiles (both engines: linear
    // interpolation at (n−1)·p). The 100 TB variant is
    // approx_percentile (t-digest-style sketch merge).
    "q10_quantiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
          percentile(col("l_extendedprice"), lit(0.95)).as("p95"),
          count(lit(1)).as("n"))
    }),

    // Equi-width histogram — the distribution profile every
    // cost-based optimizer and data-quality monitor builds. FIXED
    // width (no min/max pre-pass): bucket = floor(price / w) is one
    // identical IEEE double op on both engines, then a single
    // two-phase count/sum aggregation — one scan, one narrow shuffle
    // of (bucket, partial) rows. Totals go through DECIMAL(18,4).
    "q15_histogram" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
    }),

    // TPC-H Q17 shape through the SQL front door: a correlated scalar
    // subquery ("small-quantity" = below a fifth of the part's own
    // average) that Catalyst must DECORRELATE into an aggregate +
    // join — the optimizer surface none of the DataFrame-built
    // entries exercise (and `MergeScalarSubqueries` can fuse the two
    // correlated aggregates over the same group into one). The
    // threshold is the rational rewrite 5·qty·cnt < sum_qty — exact
    // DECIMAL/integer arithmetic, where the textbook `0.2 * avg(..)`
    // compares engine-ordered double sums and can flip edge rows.
    "q12_correlated_subquery" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("q12_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("q12_part")
      s.sql("""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_small
        FROM q12_lineitem l JOIN q12_part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#1'
          AND CAST(5 * l.l_quantity AS DECIMAL(18,4)) *
              (SELECT COUNT(*) FROM q12_lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,4)))
               FROM q12_lineitem l3 WHERE l3.l_partkey = l.l_partkey)
      """)
    }),

    // Explicit GROUPING SETS — the general form rollup (`q7`) and
    // cube (`q11`) are sugar for, with per-column GROUPING() flags
    // (the only reliable way to tell a super-aggregate NULL from a
    // data NULL). Catalyst plans one Expand over the scan (3 grouping
    // branches) + one two-phase aggregate — rows shuffle once with a
    // 3× expansion factor, not once per set. SQL front door, like
    // `q12`: grouping-set syntax has no stable DataFrame API.
    "q14_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("q14_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM q14_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      """)
    }),

    // INTERSECT / EXCEPT — the set-op planning surface (Catalyst
    // rewrites: Intersect → distinct left-semi join, Except →
    // distinct left-anti join; both inherit the join's shuffle-on-key
    // scale shape, never a row-by-row comparison). High-quantity
    // parts shipped under both return flags vs only-R, tagged into
    // one relation (the quantity cut keeps either side from covering
    // the whole part domain, so EXCEPT is non-vacuous).
    "q13_set_ops" -> ((s, dir) => {
      def keys(flag: String) = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === flag && col("l_quantity") >= 49)
        .select(col("l_partkey"))
      keys("R").intersect(keys("A"))
        .select(lit("both").as("tag"), col("l_partkey"))
        .unionAll(keys("R").except(keys("A"))
          .select(lit("only_r").as("tag"), col("l_partkey")))
    }),

    // NOT IN over a NULLABLE subquery column — the three-valued-logic
    // semantics the plain left-anti join (`q5`) never exercises, and
    // the one anti-join form a hash anti join gets WRONG: `x NOT IN S`
    // is UNKNOWN (not TRUE) when S contains a NULL, so one NULL in the
    // subquery empties the whole result. Catalyst must plan a
    // null-aware anti join here because the CASE makes the column
    // nullable. Two branches pin both halves of the contract:
    // `null_free` (nullable type, no actual NULLs → real rows survive)
    // and `null_poisoned` (two real NULLs → count collapses to 0).
    // SQL front door like `q12`: NOT-IN subqueries have no DataFrame
    // API. Scale shape: the subquery side is small after its filter →
    // broadcast; NAAJ adds only a has-null flag on top of the hash
    // lookup, so the plan stays a broadcast probe, never all-pairs.
    "q16_null_aware_anti" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("q16_customer")
      Tables.orders(s, dir).createOrReplaceTempView("q16_orders")
      s.sql("""
        SELECT 'null_free' AS variant, COUNT(*) AS n_cust
        FROM q16_customer
        WHERE c_custkey NOT IN (
          SELECT CASE WHEN o_orderkey < 0 THEN NULL ELSE o_custkey END
          FROM q16_orders WHERE o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT 'null_poisoned' AS variant, COUNT(*) AS n_cust
        FROM q16_customer
        WHERE c_custkey NOT IN (
          SELECT CASE WHEN o_orderkey % 997 = 0 THEN NULL ELSE o_custkey END
          FROM q16_orders WHERE o_orderpriority = '1-URGENT')
      """)
    }),

    // ANALYZE-style column statistics — the catalog-stats collection
    // (ndv / min / max per column) a cost-based optimizer feeds on.
    // One PRUNED single-column scan per column, unioned: N distinct
    // aggregates in one agg would plan a single scan but an
    // Expand×(N+1) row blow-up above it (measured 6.4 s vs 1.4 s at
    // sf0.1) — parquet column pruning makes the extra scans nearly
    // free while each branch keeps a plain two-phase distinct. min/max
    // export as strings so integer and flag columns share one schema
    // (bigint→string renders identically in both engines).
    "q18_column_stats" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      // Per column: pre-aggregate to the distinct-value dictionary
      // (hash aggregate — GROUPING on a string is hash-able), then
      // ndv/min/max/n_rows over the tiny dictionary. The r14 direct
      // `countDistinct + min + max` form planned the string columns
      // as SortAggregate over a FULL Sort of the table (min/max of a
      // string is an immutable agg buffer, so HashAggregate is
      // ineligible), and countDistinct expanded every row; this shape
      // replaces both with one map-side-partial hash aggregate per
      // column — at 100 TB the sort of the corpus disappears and the
      // shuffle carries one row per distinct value. Equality: ndv
      // counts non-null distincts (countDistinct semantics), n_rows
      // sums per-value counts including the null group (count(*)
      // counts nulls), min/max ignore nulls on both spellings.
      cols.map { c =>
        Tables.lineitem(s, dir)
          .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(
            count(when(col(c).isNotNull, 1)).as("ndv"),
            min(col(c)).cast("string").as("min_s"),
            max(col(c)).cast("string").as("max_s"),
            // coalesce: on an EMPTY table sum() is NULL where the old
            // count(lit(1)) and the oracle's count(*) return 0
            coalesce(sum(col("cnt")), lit(0L)).as("n_rows"))
          .select(lit(c).as("col_name"), col("ndv"),
            col("min_s"), col("max_s"), col("n_rows"))
      }.reduce(_ unionAll _)
    }),

    // TPC-H Q2 SHAPE: minimum-cost supplier per part — the correlated
    // scalar MIN in WHERE with a multi-table correlated subquery
    // (both the outer and inner sides join supplier→nation→region),
    // the remaining standard decorrelation case q12 (scalar agg of
    // the part's own rows) and q21 (EXISTS chain) don't cover.
    // Catalyst decorrelates to an aggregate-on-pk + join + equality
    // filter. partsupp surrogate: per-(part, supplier) cost =
    // MIN(l_extendedprice) — MIN/MAX select a value rather than sum,
    // so double costs are order-free and exact cross-engine. SQL
    // front door (correlated WHERE has no DataFrame API).
    "q23_min_cost_supplier" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("q23_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("q23_supplier")
      Tables.nation(s, dir).createOrReplaceTempView("q23_nation")
      Tables.region(s, dir).createOrReplaceTempView("q23_region")
      s.sql(s"""
        WITH eu AS (
          SELECT s_suppkey, s_name FROM q23_supplier
          JOIN q23_nation ON s_nationkey = n_nationkey
          JOIN q23_region ON n_regionkey = r_regionkey
          WHERE r_name = '$MinCostRegion'),
        ps AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 MIN(l_extendedprice) AS cost
          FROM q23_lineitem GROUP BY 1, 2)
        SELECT p1.pk, p1.sk, eu.s_name, p1.cost
        FROM ps p1 JOIN eu ON p1.sk = eu.s_suppkey
        WHERE p1.cost = (SELECT MIN(p2.cost)
                         FROM ps p2 JOIN eu e2 ON p2.sk = e2.s_suppkey
                         WHERE p2.pk = p1.pk)
      """)
    }),

    // TPC-H Q21 SHAPE: the chained correlated EXISTS + NOT EXISTS —
    // the hardest standard decorrelation case (Catalyst rewrites the
    // EXISTS to a left-semi and the NOT EXISTS to a left-anti join,
    // both on the correlation key). Semantics on this schema:
    // suppliers who were the SOLE supplier with returned lines on a
    // multi-supplier order. SQL front door like q12/q14/q16 —
    // correlated-exists chains have no DataFrame API.
    "q21_exists_chain" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("q21_lineitem")
      s.sql("""
        SELECT l1.l_suppkey, COUNT(DISTINCT l1.l_orderkey) AS n_orders
        FROM q21_lineitem l1
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY l1.l_suppkey
      """)
    }),

    // Share-of-total reporting (the BI percent-of-whole): revenue per
    // nation plus its share of the global total. The total is a 1-row
    // aggregate joined back by broadcast — the grand total never
    // recomputes per group and no window spans the whole relation.
    // Shares divide the DECIMAL-exact revenue doubles — one mirrored
    // IEEE division.
    "q22_share_of_total" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      val total = rev.agg(sum(col("revenue").cast("decimal(18,4)"))
        .cast("double").as("total"))
      rev.crossJoin(broadcast(total))
        .select(col("n_name"), col("n_orders"),
          round(col("revenue"), 4).as("revenue_r"),
          round(col("revenue") / col("total"), 6).as("share_r"))
    }),

    // Market-basket pair affinity — the co-occurrence op of
    // recommender bootstraps: part pairs bought together, support =
    // co-occurring orders. Scale anatomy: the pair expansion happens
    // WITHIN an order only (orders hold a handful of items — bounded
    // fan-out, the LSH-bucket principle on a natural key; corpus
    // all-pairs never materializes), after a distinct that collapses
    // repeated parts per order; the global top-20 under a TOTAL order
    // (support desc, pa, pb) is a TakeOrdered, not a full sort.
    "q20_market_basket" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = li.select(col("l_orderkey"), col("l_partkey").as("pa"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("pb"))
      a.join(b, Seq("l_orderkey")).filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("pa"), col("pb"))
        .limit(20)
    }),

    // Record linkage / entity resolution — the MDM op: match dirty
    // name variants back to the clean dictionary under an edit-
    // distance bound. The dirty side is the deterministic one-char
    // drop (2nd char of the last word — the seeded-fixture policy);
    // linkage BLOCKS on the stable first token and verifies
    // levenshtein ≤ 2 inside blocks only — the all-pairs-avoidance
    // anatomy of every dedup op here, applied to fuzzy joins. Scale
    // shape: linkage runs on the DISTINCT-name dictionary (entities
    // grow sublinearly in rows — 64 names under 20k part rows), so
    // the quadratic verify is dictionary², and only within blocks.
    "q19_record_linkage" -> ((s, dir) => {
      val names = Tables.part(s, dir)
        .select(col("p_name").as("name")).distinct()
        .withColumn("blk", split(col("name"), " ").getItem(0))
        .localCheckpoint() // dictionary feeds both the clean and dirty sides
      val w2 = split(col("name"), " ").getItem(1)
      val dirty = names.select(col("blk"),
        concat(col("blk"), lit(" "),
          concat(substring(w2, 1, 1), w2.substr(lit(3), length(w2)))).as("dirty"))
      names.join(dirty, Seq("blk"))
        .withColumn("dist", levenshtein(col("name"), col("dirty")))
        .filter(col("dist") <= 2)
        .select(col("name"), col("dirty"), col("dist"))
    }),

    // Data-quality audit (the dbt-test / Great-Expectations op): each
    // check is one aggregate over a scan or an anti-join — null-rate,
    // referential integrity, range invariant — emitted as (check,
    // n_bad, n_rows) rows. The fixture is clean, so the audited view
    // carries DETERMINISTIC key-arithmetic corruptions (the
    // text_pii_redact seeded-fixture policy: every check has real
    // matches AND real non-matches); the raw-table FK check rides
    // along and reports its honest zero. Scale shape: each check is a
    // scan-local partial aggregate or a broadcast anti join — the
    // audit is one pass per table family, never row-by-row rules.
    "q17_dq_audit" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).select(col("c_custkey"))
      val raw = Tables.orders(s, dir)
      val corrupted = raw.select(
        when(col("o_orderkey") % 500 === 0, lit(null).cast("long"))
          .when(col("o_orderkey") % 777 === 0, col("o_custkey") + 100000L)
          .otherwise(col("o_custkey")).as("k"),
        when(col("o_orderkey") % 613 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("p"))
        .localCheckpoint() // one corrupted view feeds three checks
      val nRows = corrupted.count()
      def check(name: String, bad: DataFrame) =
        bad.agg(count(lit(1)).as("n_bad"))
          .select(lit(name).as("check"), col("n_bad"), lit(nRows).as("n_rows"))
      check("null_custkey", corrupted.filter(col("k").isNull))
        .unionAll(check("fk_customer", corrupted.filter(col("k").isNotNull)
          .join(cust, col("k") === col("c_custkey"), "left_anti")))
        .unionAll(check("nonpositive_price", corrupted.filter(col("p") <= 0)))
        .unionAll(check("fk_customer_raw",
          raw.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")))
    }),

    // Distinct aggregation + exact distinct counting.
    "q8_distinct_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // Recursive CTE through the SQL front door (Spark 4 WITH
    // RECURSIVE): the month-spine gap-fill report. The Spark side and
    // the DuckDB oracle run the IDENTICAL statement text (see
    // monthSpineSql) — recursion is the last major ANSI surface with
    // no DataFrame equivalent (iterate-until-fixpoint inside ONE
    // statement; the engine's iterative operators — CC, PageRank, BFS
    // — drive the loop from the host instead).
    "orders_month_spine" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("spine_orders")
      s.sql(monthSpineSql("spine_orders"))
    })
  )

  /** `q23_min_cost_supplier`'s region cut (2 of 5 regions' suppliers
    * stay in, so the correlated MIN is over a real subset).
    */
  val MinCostRegion = "EUROPE"

  val oracleSql: Map[String, String] = Map(
    // the exact text the Spark side executes, table name aside
    "orders_month_spine" -> monthSpineSql("orders"),
    "q23_min_cost_supplier" ->
      s"""WITH eu AS (
         |  SELECT s_suppkey, s_name FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = '$MinCostRegion'),
         |ps AS (
         |  SELECT l_partkey AS pk, l_suppkey AS sk,
         |         MIN(l_extendedprice) AS cost
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT p1.pk, p1.sk, eu.s_name, p1.cost
         |FROM ps p1 JOIN eu ON p1.sk = eu.s_suppkey
         |WHERE p1.cost = (SELECT MIN(p2.cost)
         |                 FROM ps p2 JOIN eu e2 ON p2.sk = e2.s_suppkey
         |                 WHERE p2.pk = p1.pk)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_agg" ->
      """SELECT r_name, n_name, c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name, c_mktsegment""".stripMargin,
    "q4_lineitem_orders" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_semi_anti" ->
      """SELECT bucket, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM (
        |  SELECT 'with_orders' AS bucket, c_acctbal FROM customer
        |    WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |  UNION ALL
        |  SELECT 'no_orders' AS bucket, c_acctbal FROM customer
        |    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |) GROUP BY bucket""".stripMargin,
    "q6_topk_per_group" ->
      """SELECT l_returnflag, l_orderkey, order_rev, rnk FROM (
        |  SELECT l_returnflag, l_orderkey, order_rev,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY order_rev DESC, l_orderkey ASC) AS rnk
        |  FROM (
        |    SELECT l_returnflag, l_orderkey,
        |      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS order_rev
        |    FROM lineitem GROUP BY l_returnflag, l_orderkey)
        |) WHERE rnk <= 5""".stripMargin,
    "q7_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q11_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q9_orders_by_month" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(MONTH FROM o_orderdate) AS m,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY y, m""".stripMargin,
    "q10_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q15_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY bucket""".stripMargin,
    "q8_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q13_set_ops" ->
      """SELECT 'both' AS tag, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 49
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 49)
        |UNION ALL
        |SELECT 'only_r' AS tag, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 49
        |  EXCEPT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 49)""".stripMargin,
    "q14_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "q16_null_aware_anti" ->
      """SELECT 'null_free' AS variant, COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_orderkey < 0 THEN NULL ELSE o_custkey END
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'null_poisoned' AS variant, COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_orderkey % 997 = 0 THEN NULL ELSE o_custkey END
        |  FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q21_exists_chain" ->
      """SELECT l1.l_suppkey, COUNT(DISTINCT l1.l_orderkey) AS n_orders
        |FROM lineitem l1
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY l1.l_suppkey""".stripMargin,
    "q22_share_of_total" ->
      """WITH rev AS (
        |  SELECT n_name,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |t AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total
        |      FROM rev)
        |SELECT n_name, n_orders, ROUND(revenue, 4) AS revenue_r,
        |  ROUND(revenue / total, 6) AS share_r
        |FROM rev, t""".stripMargin,
    "q20_market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY support DESC, pa, pb LIMIT 20""".stripMargin,
    "q19_record_linkage" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |d AS (SELECT string_split(name, ' ')[1] AS blk,
        |        string_split(name, ' ')[1] || ' ' ||
        |        substring(string_split(name, ' ')[2], 1, 1) ||
        |        substring(string_split(name, ' ')[2], 3) AS dirty
        |      FROM names),
        |c AS (SELECT name, string_split(name, ' ')[1] AS blk FROM names)
        |SELECT c.name, d.dirty,
        |  CAST(levenshtein(c.name, d.dirty) AS INT) AS dist
        |FROM c JOIN d USING (blk)
        |WHERE levenshtein(c.name, d.dirty) <= 2""".stripMargin,
    "q18_column_stats" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_returnflag", "l_linestatus")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, COUNT(DISTINCT $c) AS ndv,
           |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s,
           |  COUNT(*) AS n_rows FROM lineitem""".stripMargin)
        .mkString("\nUNION ALL\n")
    },
    "q17_dq_audit" ->
      // scalar-subquery counts: each check emits its row even at zero
      // violations (a filtered GROUP BY would emit nothing on empty)
      """WITH c AS (
        |  SELECT CASE WHEN o_orderkey % 500 = 0 THEN NULL
        |              WHEN o_orderkey % 777 = 0 THEN o_custkey + 100000
        |              ELSE o_custkey END AS k,
        |         CASE WHEN o_orderkey % 613 = 0 THEN -o_totalprice
        |              ELSE o_totalprice END AS p
        |  FROM orders),
        |n AS (SELECT COUNT(*) AS n_rows FROM orders)
        |SELECT 'null_custkey' AS check,
        |  (SELECT COUNT(*) FROM c WHERE k IS NULL) AS n_bad, n_rows FROM n
        |UNION ALL
        |SELECT 'fk_customer',
        |  (SELECT COUNT(*) FROM c WHERE k IS NOT NULL AND NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = k)), n_rows FROM n
        |UNION ALL
        |SELECT 'nonpositive_price',
        |  (SELECT COUNT(*) FROM c WHERE p <= 0), n_rows FROM n
        |UNION ALL
        |SELECT 'fk_customer_raw',
        |  (SELECT COUNT(*) FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)), n_rows FROM n""".stripMargin,
    // decorrelated form: the per-part aggregate the subqueries become
    "q12_correlated_subquery" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_small
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN pa ON pa.pk = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND CAST(5 * l.l_quantity AS DECIMAL(18,4)) * pa.cnt < pa.sq""".stripMargin
  )
}
