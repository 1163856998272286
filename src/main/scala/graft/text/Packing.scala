package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: concatenate documents (in stable id
  * order, within a group) into training sequences of at most
  * `budget` tokens — the context-window packing step between a
  * cleaned corpus and a token loader.
  *
  * Packing is inherently sequential PER GROUP (each bin decision
  * depends on the running total), so the distributed shape is the
  * secondary-sort pattern: one shuffle on the group column,
  * `sortWithinPartitions(group, id)`, then a single linear
  * `mapPartitions` pass holding O(1) state — no group is ever
  * collected, and groups stream through whole because hash
  * partitioning never splits a key. At 100 TB the unit of
  * parallelism is the group (source / shard / date bucket), which is
  * exactly how production packing runs; an unsplittable giant group
  * is a data-layout problem (re-shard upstream), not an operator one.
  */
object Packing {

  /** @return (group, id, n_toks, bin) — `bin` is the 0-based packed
    *   sequence index within the group. Greedy rule: a document that
    *   would push the current bin past `budget` starts a new bin; a
    *   single document longer than `budget` occupies a bin alone
    *   (never dropped, never split). */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_toks"))
      .repartition(col("grp"))
      .sortWithinPartitions("grp", "id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curGrp: String = null
        var bin = 0L
        var acc = 0L
        it.map { case (g, id, n) =>
          if (g != curGrp) { curGrp = g; bin = 0L; acc = 0L }
          if (acc > 0 && acc + n > budget) { bin += 1; acc = 0L }
          acc += n
          (g, id, n, bin)
        }
      }
      .toDF(groupCol, idCol, "n_toks", "bin")
  }

  /** Deterministic trainer-shard assignment: first 24 md5 bits of
    * the id, mod `nShards`. Content-independent and engine-replayable
    * (same convention as `TextAnalysis.assignSplit`): a document's
    * shard never changes as the corpus grows, any engine can
    * recompute it, and md5's uniformity balances shards to within
    * sampling noise with no scan of the data. */
  def shardAssign(idCol: org.apache.spark.sql.Column,
      nShards: Int): org.apache.spark.sql.Column = {
    require(nShards > 0 && nShards <= (1 << 24),
      s"nShards must be in [1, 2^24]: $nShards")
    conv(substring(md5(idCol.cast("string")), 1, 6), 16, 10)
      .cast("long") % nShards
  }

  /** Per-shard manifest row: (shard, n_docs, n_tokens, n_chars) —
    * what a training job reads to plan its data-parallel split. One
    * scan, one nShards-group aggregate (partial map-side). */
  def shardStats(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    docs.select(shardAssign(col(idCol), nShards).as("shard"),
        size(TextAnalysis.wsTokens(col(textCol))).cast("long").as("n_toks"),
        length(col(textCol)).cast("long").as("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        sum("n_chars").as("n_chars"))

  /** Write the corpus as `shard=<k>/` parquet partitions plus a
    * `_manifest/` stats table. `repartition(shard)` first so each
    * shard is written by the task that owns it — without it every
    * task opens a file in every shard dir and a 1000-task write
    * creates nShards×1000 small files (the disease [[graft.sources
    * .Compaction]] exists to cure; better not to catch it). Each row
    * carries its `n_toks` (a token loader wants it anyway), so the
    * manifest aggregates from a COLUMN-PRUNED read-back of the
    * written shards — the corpus text is scanned and tokenized
    * exactly once, not once for the write and again for the stats. */
  def writeShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): Unit = {
    val sharded = docs
      .withColumn("shard", shardAssign(col(idCol), nShards))
      .withColumn("n_toks",
        size(TextAnalysis.wsTokens(col(textCol))).cast("long"))
      .withColumn("n_chars", length(col(textCol)).cast("long"))
    sharded.repartition(col("shard"))
      .write.mode("error").partitionBy("shard").parquet(outDir)
    // explicit schema: inference dies on an EMPTY partitioned write
    // (no footers), and it would type the shard partition column int
    // — the manifest keeps shardStats' long schema either way
    docs.sparkSession.read.schema(sharded.schema).parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        sum("n_chars").as("n_chars"))
      .coalesce(1).write.mode("error").parquet(s"$outDir/_manifest")
  }
}
