package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.Sharding

/** Persistent layout for a property graph, designed for the 100 TB
  * read paths:
  *
  *  - `nodes/` and `edges/` parquet partitioned by shard (low bits
  *    of the xxhash64 id — `src/egraph_shard_util.erl` policy), so
  *    a point lookup prunes to one directory and co-sharded frames
  *    co-locate;
  *  - `indexes/` parquet partitioned by (index_name, key_type) —
  *    the moral equivalent of the reference's table-per-index
  *    shards (`egraph_lookup_*_base_<NAME>`): an index probe reads
  *    exactly one directory and pushes the key predicate into the
  *    scan.
  */
object GraphStore {

  def saveNodes(nodes: DataFrame, root: String, shardBits: Int = 6): Unit =
    nodes.withColumn("shard", Sharding.shardOfId(col("id"), shardBits))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/nodes")

  def saveEdges(edges: DataFrame, root: String, shardBits: Int = 6): Unit =
    edges.withColumn("shard", Sharding.shardOfKey(col("src_key"), shardBits))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/edges")

  def saveIndexes(indexes: DataFrame, root: String): Unit =
    indexes
      // typed shadow column: numeric range probes push a native
      // double predicate to the scan (a range over the string
      // key_str cannot push, and parquet min/max stats on key_num
      // skip whole row groups)
      .withColumn("key_num", col("key_str").try_cast("double"))
      .write.mode("overwrite")
      .partitionBy("index_name", "key_type").parquet(s"$root/indexes")

  def loadNodes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/nodes")

  def loadEdges(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/edges")

  def loadIndexes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/indexes")

  /** Point lookup against the stored node partitioning: computes the
    * shard from the key so the scan prunes to one directory. */
  def nodeByKey(spark: SparkSession, root: String, key: String,
      shardBits: Int = 6): DataFrame =
    loadNodes(spark, root)
      .filter(col("shard") === Sharding.shardOfKey(lit(key), shardBits) &&
        col("key_data") === key)

  /** Index probe against the stored layout: partition pruning on
    * (index_name, key_type) + pushed key predicate. */
  def probeStored(spark: SparkSession, root: String, name: String,
      typ: String, key: String): DataFrame =
    loadIndexes(spark, root)
      .filter(col("index_name") === name && col("key_type") === typ &&
        col("key_str") === key)
      .select("node_key")

  /** Numeric range probe `[lo, hi]` against the stored layout: the
    * typed key_num column written by saveIndexes carries the range
    * as a pushed native predicate (+ row-group skipping via parquet
    * stats), on top of the (index_name, key_type) pruning. */
  def probeStoredRange(spark: SparkSession, root: String, name: String,
      typ: String, lo: Double, hi: Double): DataFrame =
    loadIndexes(spark, root)
      .filter(col("index_name") === name && col("key_type") === typ &&
        col("key_num").between(lo, hi))
      .select(col("node_key"), col("key_num").as("key_val"))
}
