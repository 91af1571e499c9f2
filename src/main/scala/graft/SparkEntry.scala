package graft

import graft.queries.{Extensions, Parity, Subqueries, Views}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (parity) plus the north-star extension operators; `oracleSql` carries
  * the DuckDB-equivalent ANSI SQL for every SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query (driver smoke-checks rows > 0 on sf0.001): the
    * pricing-summary-style aggregate — scan → filter → group → exact
    * aggregates, the engine's bread and butter. */
  def entry(spark: SparkSession): DataFrame =
    Parity.a1Aggregates(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Parity.queries ++ Extensions.queries ++ Subqueries.queries ++ Views.queries

  def oracleSql: Map[String, String] =
    Parity.oracleSql ++ Extensions.oracleSql ++ Subqueries.oracleSql ++
      Views.oracleSql
}
