package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
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
  *
  * Writes are crash-safe: each save lands in a fresh `v<timestamp>`
  * subdirectory and readers resolve the newest version whose
  * `_SUCCESS` marker exists — a writer that dies mid-save leaves an
  * incomplete, unmarked directory that readers never see, and the
  * previous version stays intact (a plain overwrite deletes the only
  * copy of prior state before the new one is durable). The two most
  * recent good versions are kept; older ones are pruned best-effort.
  */
object GraphStore {

  private val saveSeq = new AtomicLong()

  /** Monotonic, lexicographically sortable version names. */
  private def nextVersion(): String =
    f"v${System.currentTimeMillis()}%013d-${saveSeq.incrementAndGet()}%04d"

  private def goodVersions(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v")).sorted.reverse.toSeq
      .filter(v => fs.exists(new Path(dir, s"$v/_SUCCESS")))
  }

  /** Newest complete version dir, or the plain dir itself for
    * layouts written before versioning. */
  private def resolve(spark: SparkSession, dir: String): String =
    goodVersions(spark, dir).headOption.map(v => s"$dir/$v").getOrElse(dir)

  private def pruneOld(spark: SparkSession, dir: String): Unit =
    try {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      goodVersions(spark, dir).drop(2)
        .foreach(v => fs.delete(new Path(dir, v), true))
    } catch { case _: java.io.IOException => () } // pruning is best-effort

  private def versionedSave(df: DataFrame, dir: String)(
      write: (DataFrame, String) => Unit): Unit = {
    write(df, s"$dir/${nextVersion()}")
    pruneOld(df.sparkSession, dir)
  }

  def saveNodes(nodes: DataFrame, root: String, shardBits: Int = 6): Unit =
    versionedSave(nodes, s"$root/nodes") { (df, path) =>
      df.withColumn("shard", Sharding.shardOfId(col("id"), shardBits))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    }

  def saveEdges(edges: DataFrame, root: String, shardBits: Int = 6): Unit =
    versionedSave(edges, s"$root/edges") { (df, path) =>
      df.withColumn("shard", Sharding.shardOfKey(col("src_key"), shardBits))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    }

  def saveIndexes(indexes: DataFrame, root: String): Unit =
    versionedSave(indexes, s"$root/indexes") { (df, path) =>
      df
        // typed shadow column: numeric range probes push a native
        // double predicate to the scan (a range over the string
        // key_str cannot push, and parquet min/max stats on key_num
        // skip whole row groups)
        .withColumn("key_num", col("key_str").try_cast("double"))
        .write.mode("overwrite")
        .partitionBy("index_name", "key_type").parquet(path)
    }

  def loadNodes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, s"$root/nodes"))

  def loadEdges(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, s"$root/edges"))

  def loadIndexes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, s"$root/indexes"))

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
