package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions shared by every query and its DuckDB oracle:
  *  - every computed column is aliased identically on both sides;
  *  - every float output is `round(_, 4)` on both sides, with sums
  *    carried in DECIMAL(38,6) so the two engines agree exactly;
  *  - every result is deterministically ordered by a unique key.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ EgraphQueries.queries ++ LlmQueries.queries

  def oracleSql: Map[String, String] =
    Analytics.oracles ++ EgraphQueries.oracles ++ LlmQueries.oracles
}
