package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-format and table-layout queries: the engine's job is not
  * just computing over parquet but moving corpora BETWEEN formats and
  * layouts — format migration (parquet↔ORC, both columnar formats
  * Spark ships vectorized readers for) and partitioned-directory
  * layout (the Hive `col=value/` convention every lakehouse table
  * uses, where a predicate on the partition column prunes entire
  * directories before any file opens).
  *
  * Both fixtures live under target/ (never committed), fixed paths,
  * overwrite-on-build — the [[CsvQueries.FixturePath]] policy.
  */
object StorageQueries {

  /** Repo-local fixture roots — absolute, under target/. */
  val OrcPath = "/root/repo/target/graft-fixtures/documents_orc"
  val PartPath = "/root/repo/target/graft-fixtures/documents_by_source"
  val EvoPath = "/root/repo/target/graft-fixtures/documents_evolution"
  val JsonlPath = "/root/repo/target/graft-fixtures/documents_jsonl"

  /** The partition-pruning predicate's source list: a 2-of-20
    * selection so the pruned scan touches 10% of directories.
    */
  val PrunedSources = Seq("src3", "src7")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Format migration parquet → ORC → engine, verified by the
    // cross-engine table checksum (the text_table_checksum op — count,
    // order-independent content fingerprint, char sum, id range per
    // source). The oracle reads the ORIGINAL parquet, so hash equality
    // proves the ORC writer+reader round-trips every row and column
    // bit-faithfully — the validation an actual format migration runs.
    // Scale shape: the rewrite is one narrow scan→write per partition
    // (no shuffle); the checksum aggregates map-side to ≤ |sources|
    // rows.
    "docs_orc_roundtrip" -> ((s, dir) => {
      Tables.documents(s, dir).write.mode("overwrite").orc(OrcPath)
      TextQueries.tableChecksumOf(s.read.orc(OrcPath))
    }),

    // The row-format twin: parquet → JSONL → engine (the interchange
    // format corpora actually arrive in), same cross-engine checksum
    // gate. The read supplies the EXPLICIT schema — schema inference
    // is a second full pass over the data at 100 TB and can widen
    // types nondeterministically; a production JSONL ingest always
    // pins its schema. JSON string escaping round-trips through the
    // writer/reader pair and is proven byte-faithful by the md5
    // content fingerprint.
    "docs_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.write.mode("overwrite").json(JsonlPath)
      TextQueries.tableChecksumOf(s.read.schema(docs.schema).json(JsonlPath))
    }),

    // Hive-style partitioned layout: documents written partitionBy
    // (source) — 20 `source=…/` directories — then read back with a
    // partition predicate. The filter never reaches row decoding: it
    // prunes DIRECTORIES at planning time (PartitionFilters in the
    // scan node, pinned by PlanShapeSpec), which at 100 TB is the
    // difference between opening 2 and 2000 partitions. The rollup
    // re-aggregates per source so the oracle checks content, not just
    // counts; n_chars rides through the partitioned files, source
    // through directory names.
    "docs_partitioned_scan" -> ((s, dir) => {
      Tables.documents(s, dir).write.mode("overwrite")
        .partitionBy("source").parquet(PartPath)
      s.read.parquet(PartPath)
        .filter(col("source").isin(PrunedSources: _*))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars_sum"),
          min(col("doc_id")).as("id_min"),
          max(col("doc_id")).as("id_max"))
    }),

    // Schema evolution across file generations — the lakehouse
    // reality that a long-lived table's early files lack columns later
    // files carry: generation 1 (even doc_ids) is written WITHOUT the
    // `lang` column, generation 2 (odd) with it, into `gen=N/`
    // partition directories; `mergeSchema` unifies them at read time
    // (gen-1 rows surface NULL lang — no rewrite of old files, the
    // whole point at 100 TB). The rollup counts lang coverage per
    // source, so the oracle pins exactly which half carries the new
    // column. mergeSchema is a read option because schema union costs
    // a footer read per file — production sets it once in the table
    // catalog, not per query.
    "docs_schema_evolution" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$EvoPath/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .write.mode("overwrite").parquet(s"$EvoPath/gen=2")
      s.read.option("mergeSchema", "true").parquet(EvoPath)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("lang")).as("n_with_lang"),
          sum(col("n_chars")).as("chars_sum"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // oracle reads the original PARQUET — equality proves the ORC
    // round trip faithful
    "docs_orc_roundtrip" -> TextQueries.oracleSql("text_table_checksum"),
    "docs_jsonl_roundtrip" -> TextQueries.oracleSql("text_table_checksum"),
    "docs_partitioned_scan" -> {
      val srcs = PrunedSources.map(s => s"'$s'").mkString(", ")
      s"""SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
         |  MIN(doc_id) AS id_min, MAX(doc_id) AS id_max
         |FROM documents WHERE source IN ($srcs)
         |GROUP BY source""".stripMargin
    },
    // gen-1 (even ids) rows carry no lang column → NULL after the
    // schema merge, so lang coverage = the odd half exactly
    "docs_schema_evolution" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (doc_id % 2 = 1) AS n_with_lang,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        |FROM documents GROUP BY source""".stripMargin
  )
}
