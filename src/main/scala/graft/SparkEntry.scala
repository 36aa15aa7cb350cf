package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions._
import graft.streaming.EventQueries

/** Driver contract — see /root/repo/SURVEY.md §2b for the inventory.
  * Each category object contributes `queries` (Spark-side) and `oracle`
  * (ANSI-SQL twin for the DuckDB differential check). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q14_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanQueries.queries ++
    JoinQueries.queries ++
    AggQueries.queries ++
    WindowQueries.queries ++
    SetQueries.queries ++
    FnQueries.queries ++
    FnQueries2.queries ++
    EventQueries.queries ++
    EventAnalytics.queries ++
    LlmQueries.queries ++
    TextQueries.queries ++
    SimilarityQueries.queries ++
    ExtraQueries.queries ++
    CorpusQueries.queries ++
    CurationQueries.queries ++
    GraphQueries.queries ++
    MultimodalQueries.queries ++
    WarehouseQueries.queries ++
    AuditQueries.queries ++
    UdfQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScanQueries.oracle ++
    JoinQueries.oracle ++
    AggQueries.oracle ++
    WindowQueries.oracle ++
    SetQueries.oracle ++
    FnQueries.oracle ++
    FnQueries2.oracle ++
    EventQueries.oracle ++
    EventAnalytics.oracle ++
    LlmQueries.oracle ++
    TextQueries.oracle ++
    SimilarityQueries.oracle ++
    ExtraQueries.oracle ++
    CorpusQueries.oracle ++
    CurationQueries.oracle ++
    GraphQueries.oracle ++
    MultimodalQueries.oracle ++
    WarehouseQueries.oracle ++
    AuditQueries.oracle ++
    UdfQueries.oracle
}
