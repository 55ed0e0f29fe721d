package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query registry in `graft.queries.*`. Each operator
  * from SURVEY.md §2 (and the §2.2 extensions) surfaces here as a named
  * query + a DuckDB oracle SQL. Registries keep query code close to the
  * operators they exercise.
  */
object SparkEntry {

  private val registries: Seq[QueryRegistry] = Seq(
    QueryRegistry(
      _root_.graft.queries.TpchQueries.queries,
      _root_.graft.queries.TpchQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.TaxiQueries.queries,
      _root_.graft.queries.TaxiQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.StreamingQueries.queries,
      _root_.graft.queries.StreamingQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.TextQueries.queries,
      _root_.graft.queries.TextQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.DedupQueries.queries,
      _root_.graft.queries.DedupQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.SimilarityQueries.queries,
      _root_.graft.queries.SimilarityQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.MultimodalQueries.queries,
      _root_.graft.queries.MultimodalQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.EventQueries.queries,
      _root_.graft.queries.EventQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.CsvQueries.queries,
      _root_.graft.queries.CsvQueries.oracleSql),
    QueryRegistry(
      _root_.graft.queries.StorageQueries.queries,
      _root_.graft.queries.StorageQueries.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracleSql).toMap
}

final case class QueryRegistry(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracleSql: Map[String, String])
