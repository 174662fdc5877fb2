package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query registries. Every key in `queries`
  * with an entry in `oracleSql` is hash-verified against DuckDB at sf0.01;
  * keys without oracle SQL get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature computation: extractive TF-IDF summarization
    * over the document corpus (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.NlpQueries.q03Summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.NlpQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.AnalysisQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.TopicQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.NlpQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.AnalysisQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql
}
