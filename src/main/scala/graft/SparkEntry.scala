package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All declared operators live in per-domain corpus objects; this object just
  * aggregates them into the driver's expected shape.
  */
object SparkEntry {

  /** Every declared operator (SURVEY.md §2B), across all domains. */
  def corpus: Seq[Q] =
    relational.Relational.qs ++
      relational.WindowQueries.qs ++
      relational.FunctionQueries.qs ++
      relational.EventQueries.qs ++
      relational.EventQueries.qs2 ++
      cdc.CdcQueries.qs ++
      functions.Udx.qs ++
      llm.LlmQueries.qs ++
      multimodal.MultimodalQueries.qs ++
      streaming.StreamQueries.qs ++
      sources.LayoutQueries.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Relational.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    corpus.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    corpus.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
