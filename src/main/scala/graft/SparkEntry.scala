package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ExtensionQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry layout:
  *  - [[graft.queries.ParityQueries]]  — one oracle-checked query per
  *    SURVEY.md §2 operator (prefix = operator id: s4_, t3_, k1_, …).
  *  - [[graft.queries.AnalyticsQueries]] — aggregation/join/window
  *    capability queries (§2.5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ AnalyticsQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ AnalyticsQueries.oracles ++ ExtensionQueries.oracles
}
