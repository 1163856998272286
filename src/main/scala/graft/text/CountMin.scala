package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the classic
  * mergeable frequency sketch, completing the sketch family next to
  * HLL (q11), quantile sketches (q11), Bloom (d_decontaminate_bloom)
  * and Space-Saving (t_heavyhitters): `depth × width` counters,
  * point estimate = min over rows of the token's counter, one-sided
  * error (never under-counts, over-counts by ≤ 2N/width with
  * probability 1 − 2^−depth).
  *
  * DataFrame realization: the counter table IS a grouped count on
  * (row, bucket) — map-side partial aggregation bounds the shuffle
  * at `partitions × depth × width` rows regardless of corpus or
  * vocabulary size (the same 100 TB contract as Space-Saving, with
  * point-query instead of top-k semantics). Estimates for the
  * query tokens join the depth·|queries|-row probe frame against
  * the ≤ depth·width-row cell table — both tiny, AQE broadcasts.
  *
  * Buckets derive from md5 (engine-portable), so the oracle replays
  * the EXACT cells — the estimates are exactly checkable even in
  * the collision regime, not just when the sketch happens to be
  * exact. */
object CountMin {

  /** Per-token estimated vs true counts for `queryTokens`:
    * (token, est, true_count, overcount ≥ 0). */
  def estimate(docs: DataFrame, textCol: String,
      queryTokens: Seq[String], depth: Int = 4, width: Int = 512)
      : DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape $depth x $width")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("t"))
    def buckets(tokCol: String) = posexplode(expr(
      s"""transform(sequence(0, ${depth - 1}),
            d -> CAST(conv(substring(md5(concat(CAST(d AS STRING), '|',
                 $tokCol)), 1, 8), 16, 10) AS BIGINT) % $width)"""))
    val cells = toks.select(buckets("t").as(Seq("d", "bucket")))
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    val probes = queryTokens.toDF("token")
      .select(col("token"), buckets("token").as(Seq("d", "bucket")))
    // left join: a query token whose cell no row ever touched reads 0
    val est = probes.join(cells, Seq("d", "bucket"), "left")
      .groupBy("token").agg(min(coalesce(col("c"), lit(0L))).as("est"))
    val truth = toks.filter(col("t").isin(queryTokens: _*))
      .groupBy(col("t").as("token")).agg(count(lit(1)).as("true_count"))
    est.join(truth, Seq("token"), "left")
      .select(col("token"), col("est").cast("long").as("est"),
        coalesce(col("true_count"), lit(0L)).cast("long").as("true_count"),
        (col("est") - coalesce(col("true_count"), lit(0L))).cast("long")
          .as("overcount"))
      .orderBy("token")
  }
}
