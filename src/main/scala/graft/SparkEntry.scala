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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A miniature of the library's whole purpose — a curation
    * pipeline over the document corpus: Gopher-style rule gate →
    * exact-dedup keepers only → deterministic train/val/test split →
    * per-(source, split) document and token counts. Four operators
    * from SURVEY §2 composed end-to-end in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val gated = text.TextAnalysis
      .gopherRules(docs, "doc_id", "text").filter(col("keep"))
      .select("doc_id", "n_tokens")
    val keepers = dedup.Dedup.exactGroups(docs, "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    docs.select("doc_id", "source")
      .join(gated, "doc_id")
      .join(keepers, "doc_id")
      .groupBy(col("source"),
        text.TextAnalysis.assignSplit(col("doc_id")).as("split"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("source", "split")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ EgraphQueries.queries ++ LlmQueries.queries

  def oracleSql: Map[String, String] =
    Analytics.oracles ++ EgraphQueries.oracles ++ LlmQueries.oracles
}
