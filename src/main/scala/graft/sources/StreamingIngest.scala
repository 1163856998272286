package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.plans.Materialize._

/** Continuous ingestion: the streaming form of the reference's write
  * surface (`POST /detail` arriving as a stream rather than a
  * batch). Each micro-batch is one latest-wins upsert into the
  * persistent GraphStore layout, with indexes maintained
  * incrementally — so readers always see a consistent
  * (nodes, indexes) pair and a point probe stays partition-pruned
  * while the stream runs.
  *
  * Within one micro-batch the same key may arrive twice; the batch
  * is first reduced to its last version per key (max ingest ts),
  * then merged. State lives entirely in the store — the streaming
  * query itself is stateless, so it scales with batch size, not
  * history.
  *
  * Crash safety: GraphStore saves are versioned (the previous good
  * version is never deleted mid-write) and the batch's
  * (nodes, indexes) pair is published by one atomic epoch flip after
  * both saves land — readers always resolve a consistent pair. A
  * crash anywhere mid-batch leaves the previous epoch readable, and
  * foreachBatch commits the source offset only after the batch
  * function returns, so the batch re-runs on restart and converges.
  */
object StreamingIngest {

  /** Start ingesting a document stream into `root`. The stream must
    * have columns (key, doc, ts); index specs as in DocumentIngest.
    * Processes every available batch then stops when `availableNow`
    * (the batch-test-friendly trigger), else runs continuously. */
  def start(docs: DataFrame, keyCol: String, detailsCol: String,
      tsCol: String, specs: Seq[DocumentIngest.IndexSpec], root: String,
      checkpoint: String, availableNow: Boolean = false): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, keyCol, detailsCol, tsCol, specs, root)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One micro-batch merge: last version per key wins, then
    * upsert nodes + incremental reindex, rewriting the store. */
  private[sources] def ingestBatch(batch: DataFrame, keyCol: String,
      detailsCol: String, tsCol: String,
      specs: Seq[DocumentIngest.IndexSpec], root: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // last write per key within the batch (ts, then details as a
    // deterministic tie-break)
    val latest = batch
      .groupBy(col(keyCol).cast("string").as("key_data"))
      .agg(max(struct(col(tsCol).as("ts"),
        col(detailsCol).cast("string").as("details"))).as("last"))
      .select(col("key_data"), col("last.details").as("details"))
      .withColumn("id", xxhash64(col("key_data")))
    val (curNodes, curIx) = current(spark, root)
    val nodes = DocumentIngest.upsertNodes(curNodes, latest)
    val ix = curIx match {
      case Some(cur) => DocumentIngest.upsertIndexes(cur, latest, specs)
      case None => DocumentIngest.indexes(latest, specs)
    }
    // materialize once, save both tables, then flip the root epoch
    // atomically — readers resolve through the epoch, so they see
    // the (nodes, indexes) pair of THIS batch or the previous one,
    // never nodes from one and indexes from the other
    val nodesOut = nodes.materialize()
    val ixOut = ix.materialize()
    val nv = GraphStore.saveNodes(nodesOut, root, publish = false)
    val iv = GraphStore.saveIndexes(ixOut, root, publish = false)
    GraphStore.commitEpoch(spark, root, Map("nodes" -> nv, "indexes" -> iv))
  }

  private def current(spark: SparkSession, root: String)
      : (DataFrame, Option[DataFrame]) = {
    // prior-state detection must go through the store's own resolution
    // (Hadoop FS + versions), not java.io.File — on a non-local root
    // (hdfs://, s3a://) a local-disk check is always false and every
    // batch would silently discard all previously ingested state
    if (!GraphStore.hasTable(spark, root, "nodes"))
      (spark.emptyDataFrame
        .select(lit("").as("key_data"), lit("").as("details"),
          lit(0L).as("id")).limit(0),
        None)
    else
      (GraphStore.loadNodes(spark, root).drop("shard"),
        // key_num is derived; saveIndexes recomputes it on write
        Some(GraphStore.loadIndexes(spark, root).drop("key_num")))
  }
}
