package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Conventions shared by every query and its DuckDB oracle:
  *  - every computed column is aliased identically on both sides;
  *  - outputs carry only engine-portable types (string, int,
  *    float64, timestamp[us]) — money arithmetic runs exactly in
  *    decimals operand-by-operand and casts the final value to
  *    double, so no rounding-mode, accumulation-order or decimal-
  *    rendering difference between engines can surface;
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
