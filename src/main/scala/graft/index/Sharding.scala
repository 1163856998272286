package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard routing, the Spark re-expression of the reference's
  * "last 11 bits of the xxhash64 id" policy
  * (`src/egraph_shard_util.erl`, `sql/egraph_table_creation.sql`
  * sharding comments): 2^bits shards addressed by the low bits of
  * the node id.
  *
  * In Spark the shard id doubles as (a) the bucket column for
  * bucketed writes — two tables bucketed on the same shard id join
  * without a shuffle — and (b) the partition column for
  * directory-pruned point lookups at 100 TB.
  */
object Sharding {

  val DefaultBits = 11 // 2048 shards, like the reference

  /** Shard of a 64-bit node id: low `bits` bits. */
  def shardOfId(id: Column, bits: Int = DefaultBits): Column =
    id.bitwiseAND(lit((1L << bits) - 1L))

  /** Shard of a raw key: hash first, exactly like the reference's
    * key_data → xxhash64 → shard chain. */
  def shardOfKey(key: Column, bits: Int = DefaultBits): Column =
    shardOfId(xxhash64(key), bits)

  /** Write a frame bucketed+sorted by its shard, so co-sharded
    * frames join shuffle-free and point probes prune. */
  def writeSharded(df: DataFrame, idCol: String, table: String,
      buckets: Int = 64, bits: Int = DefaultBits): Unit =
    df.withColumn("shard", shardOfId(col(idCol), bits))
      .write.mode("overwrite")
      .bucketBy(buckets, "shard").sortBy("shard", idCol)
      .saveAsTable(table)
}
