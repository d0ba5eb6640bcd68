package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupQueries, DocumentQueries, EmbeddingQueries,
  EtlQueries, EventQueries, MultimodalQueries, RelationalQueries,
  RelationalQueries2}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries a DuckDB-equivalent
  * statement for every query whose semantics are ANSI-SQL-expressible.
  * Keys and output column names match between the two exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + broadcast dims + hash agg (SURVEY §2.2 "joins").
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RelationalQueries2.queries ++
      EventQueries.queries ++
      DocumentQueries.queries ++ EtlQueries.queries ++
      DedupQueries.queries ++ EmbeddingQueries.queries ++
      MultimodalQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ RelationalQueries2.oracleSql ++
      EventQueries.oracleSql ++
      DocumentQueries.oracleSql ++ EtlQueries.oracleSql ++
      DedupQueries.oracleSql ++ EmbeddingQueries.oracleSql ++
      MultimodalQueries.oracleSql

  /** Queries that by design have no oracle (→ reason), dumped by Verify
    * as no_oracle.json so the gate artifact distinguishes "cannot be
    * cross-engine checked, self-checks instead" from "broken". */
  def noOracleByDesign: Map[String, String] =
    RelationalQueries2.noOracleByDesign
}
