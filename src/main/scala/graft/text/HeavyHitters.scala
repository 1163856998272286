package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.plans.Materialize._

/** Space-Saving heavy hitters (Metwally, Agrawal & El Abbadi 2005):
  * approximate top-k token counts in ONE pass with O(capacity)
  * memory per partition, no matter the corpus size.
  *
  * This is the 100 TB form of the exact `t_vocab` query: exact
  * counting shuffles one row per distinct token (web-scale corpora
  * have billions), while Space-Saving keeps a fixed-size summary per
  * partition — the shuffle moves ≤ partitions × capacity rows total,
  * independent of both corpus and vocabulary size.
  *
  * Merge (mergeable-summaries, Agarwal et al. 2012): a token absent
  * from partition p's summary may still have occurred up to m_p times
  * there, where m_p is p's eviction floor (the minimum estimate in a
  * full summary, 0 if p never evicted — Space-Saving's absent-token
  * bound). Summing per-token estimates alone would undercount such
  * tokens and break the upper bound, so the merge credits every
  * absent partition's floor to both the estimate and the error bound:
  * `est' = Σ_{p∋t} est_p + Σ_{p∌t} m_p`, same for err. Equivalently
  * (how it's computed here, without enumerating absent partitions):
  * `est' = Σ_{p∋t} (est_p − m_p) + M` with `M = Σ_p m_p` a tiny
  * broadcast scalar. Both sides of `est − err_bound ≤ true ≤ est`
  * then hold for every partition layout: upper because each absent
  * partition contributes ≤ m_p true occurrences, lower because
  * est'−err' = Σ_{p∋t}(est_p−err_p) ≤ Σ_{p∋t} true_p ≤ true.
  *
  * Determinism contract: while NO partition overflows its capacity
  * (count-map smaller than `capacity`), Space-Saving degrades to
  * exact per-partition counting — every floor is 0, the merge reduces
  * to the plain sum, zero error, partition-layout-free, and therefore
  * DuckDB-oracle-checkable (the demo corpus vocabulary is far under
  * the default capacity; the driver query runs in this regime
  * deliberately). In the eviction regime the summary depends on
  * partition layout like any per-partition sketch; the error BOUND
  * holds for every layout, and the spec pins it on a synthetic skewed
  * stream with capacity ≪ distinct across multiple partitions.
  */
object HeavyHitters {

  /** One summary row as a plain tuple (token, est, err, pmin) —
    * `token == null` marks the per-partition floor carrier row
    * (needed because partitions NOT containing a token must still
    * contribute their floor to its merged estimate). A tuple, not a
    * nested case class: Janino cannot compile the serializer
    * generated for a private nested case class (observed
    * "No applicable constructor/method found ... Entry.token()"
    * falling the summary projection back to interpreted mode), while
    * the tuple encoder stays fully codegen'd. */
  private type Entry = (String, Long, Long, Long)

  /** One Space-Saving pass over a partition's tokens. Eviction picks
    * the minimum (count, token) entry — the token tie-break makes the
    * per-partition summary a pure function of the partition's bag of
    * tokens. TreeSet + HashMap keep each step O(log capacity). */
  private def summarize(it: Iterator[String], capacity: Int)
      : Iterator[Entry] = {
    val counts = new java.util.HashMap[String, Array[Long]]() // (est, err)
    implicit val ord: Ordering[(Long, String)] = Ordering.Tuple2
    val byCount = new java.util.TreeSet[(Long, String)](ord)
    var evicted = false
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
        evicted = true
        val min = byCount.pollFirst() // smallest (count, token)
        counts.remove(min._2)
        counts.put(tok, Array(min._1 + 1, min._1))
        byCount.add((min._1 + 1, tok))
      }
    }
    // absent-token bound: 0 until the first eviction (absent ⇒ never
    // seen), the current minimum estimate after (min is monotone
    // non-decreasing, and an evicted token's count never exceeds it)
    val floor = if (evicted) byCount.first()._1 else 0L
    val out = Vector.newBuilder[Entry]
    if (counts.size > 0) out += ((null, 0L, 0L, floor))
    counts.forEach((t, ce) => out += ((t, ce(0), ce(1), floor)))
    out.result().iterator
  }

  /** Top-k tokens by Space-Saving estimate; `err_bound = 0` rows are
    * provably exact counts. Plan: map-side summaries (mapPartitions,
    * bounded state) → one shuffle of ≤ partitions × (capacity+1) rows
    * → floor-credited merge (single-row broadcast of the total floor)
    * → TakeOrdered k. Ties at the cut break on token. */
  def topTokens(docs: DataFrame, textCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens: Dataset[String] = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("token"))
      .as[String]
    // both the floor scalar and the merge read the summaries; they are
    // tiny by construction (≤ partitions × (capacity+1) rows), so
    // materialize once via eager localCheckpoint — blocks are
    // reclaimed by the ContextCleaner when the frame is GC'd, unlike
    // an un-unpersisted cache (a lazy persist here could never be
    // unpersisted before the caller's action runs)
    val summaries = tokens.mapPartitions(summarize(_, capacity))
      .toDF("token", "est", "err", "pmin")
      .materialize(true)
    // M = Σ_p m_p, from the one floor-carrier row per partition.
    // Tiny (≤ one row per partition pre-agg) and broadcast back.
    val totalFloor = summaries.filter(col("token").isNull)
      .agg(coalesce(sum(col("pmin")), lit(0L)).as("m_total"))
    val merged = summaries.filter(col("token").isNotNull)
      .groupBy("token")
      .agg(sum(col("est") - col("pmin")).as("adj_est"),
        sum(col("err") - col("pmin")).as("adj_err"))
      .crossJoin(broadcast(totalFloor))
      .select(col("token"),
        (col("adj_est") + col("m_total")).as("est"),
        (col("adj_err") + col("m_total")).as("err_bound"))
      .orderBy(col("est").desc, col("token"))
      .limit(k)
    merged
  }
}
