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

  /** Epoch-pinned version if a root epoch names this table, else the
    * newest complete version dir, else the plain dir itself for
    * layouts written before versioning. */
  private def resolve(spark: SparkSession, root: String,
      table: String): String = {
    val dir = s"$root/$table"
    currentEpoch(spark, root).get(table)
      .filter(v => goodVersions(spark, dir).contains(v))
      .orElse(goodVersions(spark, dir).headOption)
      .map(v => s"$dir/$v").getOrElse(dir)
  }

  /** The root epoch: table → pinned version. Written atomically by
    * [[commitEpoch]] AFTER all of a batch's table saves, so readers
    * resolving through it always see one consistent snapshot —
    * per-table versioning alone still exposes a window where nodes
    * are new but indexes old. Absent for plain layouts. */
  def currentEpoch(spark: SparkSession, root: String): Map[String, String] = {
    val p = new Path(s"$root/_EPOCH")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
    }
  }

  /** Atomically pin (table → version) for readers: write a temp file
    * then rename over _EPOCH — rename is atomic on POSIX and HDFS,
    * so a reader sees either the old pinning or the new, never a
    * torn one. Tables not named keep their previous pin. */
  def commitEpoch(spark: SparkSession, root: String,
      versions: Map[String, String]): Unit = {
    val merged = currentEpoch(spark, root) ++ versions
    val p = new Path(s"$root/_EPOCH")
    val tmp = new Path(s"$root/._EPOCH.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(merged.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename-with-overwrite is atomic: readers see the old pinning
    // or the new, never a missing or torn one
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def pruneOld(spark: SparkSession, root: String,
      table: String): Unit =
    try {
      val dir = s"$root/$table"
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pinned = currentEpoch(spark, root).get(table)
      goodVersions(spark, dir).drop(2).filterNot(pinned.contains)
        .foreach(v => fs.delete(new Path(dir, v), true))
    } catch { case _: java.io.IOException => () } // pruning is best-effort

  /** Returns the version name the frame was written under, for
    * [[commitEpoch]]. */
  private def versionedSave(df: DataFrame, root: String, table: String)(
      write: (DataFrame, String) => Unit): String = {
    val v = nextVersion()
    write(df, s"$root/$table/$v")
    pruneOld(df.sparkSession, root, table)
    v
  }

  def saveNodes(nodes: DataFrame, root: String, shardBits: Int = 6): String =
    versionedSave(nodes, root, "nodes") { (df, path) =>
      df.withColumn("shard", Sharding.shardOfId(col("id"), shardBits))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    }

  def saveEdges(edges: DataFrame, root: String, shardBits: Int = 6): String =
    versionedSave(edges, root, "edges") { (df, path) =>
      df.withColumn("shard", Sharding.shardOfKey(col("src_key"), shardBits))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    }

  def saveIndexes(indexes: DataFrame, root: String): String =
    versionedSave(indexes, root, "indexes") { (df, path) =>
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
    spark.read.parquet(resolve(spark, root, "nodes"))

  def loadEdges(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, root, "edges"))

  def loadIndexes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, root, "indexes"))

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
