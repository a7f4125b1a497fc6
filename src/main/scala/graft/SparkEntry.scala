package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from per-module [[QueryDef]] lists; every entry with
  * an oracle participates in the driver's DuckDB hash-compare at sf0.01.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    _root_.graft.queries.RefQueries.defs ++
      _root_.graft.queries.RefQueries2.defs ++
      _root_.graft.queries.GoldQueries.defs ++
      _root_.graft.queries.TextQueries.defs ++
      _root_.graft.queries.DedupQueries.defs ++
      _root_.graft.queries.SimilarityQueries.defs ++
      _root_.graft.queries.ExtQueries.defs ++
      _root_.graft.queries.AnalyticsQueries.defs ++
      _root_.graft.queries.TrainingDataQueries.defs ++
      _root_.graft.queries.ProfilingQueries.defs ++
      _root_.graft.queries.OpsQueries.defs ++
      _root_.graft.queries.EvalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q21_cost_report chains the full Gold-report operator spine:
    * window dedup → sum-case pivot → listagg → join → running total.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q21_cost_report")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
