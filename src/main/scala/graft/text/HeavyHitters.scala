package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Space-Saving heavy hitters (Metwally, Agrawal & El Abbadi 2005):
  * approximate top-k token counts in ONE pass with O(capacity)
  * memory per partition, no matter the corpus size.
  *
  * This is the 100 TB form of the exact `t_vocab` query: exact
  * counting shuffles one row per distinct token (web-scale corpora
  * have billions), while Space-Saving keeps a fixed-size summary per
  * partition — the shuffle moves ≤ partitions × capacity rows total,
  * independent of both corpus and vocabulary size. Partition
  * summaries merge by summing per-token estimates and error bounds
  * (the standard mergeable-summaries result, Agarwal et al. 2012):
  * the merged estimate stays within [true, true + Σ err_i], so
  * `est − err_bound ≤ true ≤ est` per emitted token.
  *
  * Determinism contract: while NO partition overflows its capacity
  * (count-map smaller than `capacity`), Space-Saving degrades to
  * exact per-partition counting — zero error, partition-layout-free,
  * and therefore DuckDB-oracle-checkable (the demo corpus vocabulary
  * is far under the default capacity; the driver query runs in this
  * regime deliberately). In the eviction regime the summary depends
  * on partition layout like any per-partition sketch; the error
  * BOUND still holds for every layout, and the spec pins it on a
  * synthetic skewed stream with capacity ≪ distinct.
  */
object HeavyHitters {

  private case class Entry(token: String, est: Long, err: Long)

  /** One Space-Saving pass over a partition's tokens. Eviction picks
    * the minimum (count, token) entry — the token tie-break makes the
    * per-partition summary a pure function of the partition's bag of
    * tokens. TreeSet + HashMap keep each step O(log capacity). */
  private def summarize(it: Iterator[String], capacity: Int)
      : Iterator[Entry] = {
    val counts = new java.util.HashMap[String, Array[Long]]() // (est, err)
    implicit val ord: Ordering[(Long, String)] = Ordering.Tuple2
    val byCount = new java.util.TreeSet[(Long, String)](ord)
    it.foreach { tok =>
      val cur = counts.get(tok)
      if (cur != null) {
        byCount.remove((cur(0), tok))
        cur(0) += 1
        byCount.add((cur(0), tok))
      } else if (counts.size < capacity) {
        counts.put(tok, Array(1L, 0L))
        byCount.add((1L, tok))
      } else {
        val min = byCount.pollFirst() // smallest (count, token)
        counts.remove(min._2)
        counts.put(tok, Array(min._1 + 1, min._1))
        byCount.add((min._1 + 1, tok))
      }
    }
    val out = Vector.newBuilder[Entry]
    counts.forEach((t, ce) => out += Entry(t, ce(0), ce(1)))
    out.result().iterator
  }

  /** Top-k tokens by Space-Saving estimate; `err_bound = 0` rows are
    * provably exact counts. Plan: map-side summaries (mapPartitions,
    * bounded state) → one shuffle of ≤ partitions × capacity rows →
    * TakeOrdered k. Ties at the cut break on token. */
  def topTokens(docs: DataFrame, textCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens: Dataset[String] = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .as[String]
    tokens.mapPartitions(summarize(_, capacity)).toDF()
      .groupBy("token")
      .agg(sum(col("est")).as("est"), sum(col("err")).as("err_bound"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
  }
}
