package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.EmbeddingDedupIndex

/** Embedding-dedup-on-arrival as a STREAM — the vector twin of
  * [[StreamingDedup]] (the r9 verdict's named capability gap: the
  * embedding index supported named-segment replay but had no
  * streaming driver, so a vector stream had to hand-roll foreachBatch
  * + epoch naming + a pairs log). Each micro-batch of (id, vector)
  * rows is cosine-near-dup checked against everything ingested so far
  * via the [[EmbeddingDedupIndex]] segment store (new×store plus
  * new×new candidates, never store×store), its verdicts are appended
  * to a queryable pairs log, and the batch folds into the index.
  *
  * Protocol identical to [[StreamingDedup]] — stateless streaming
  * query, state in the store, every artifact keyed by (checkpoint
  * epoch, batch id), segment committed before the pairs dir, pairs
  * `_COMMITTED` written LAST by this code; replay convergence,
  * shadow-aware guards, tiered auto-compaction — with two deltas:
  *
  *  - no legacy-name adoption: no pre-epoch build ever wrote
  *    embedding stream segments, so epoched names are the only
  *    contract (a `seg-batch-<id>` here is a direct harness caller's,
  *    honored only for `epoch = None`);
  *  - a pending REBAND intent fails the batch loudly
  *    ([[EmbeddingDedupIndex.update]] refuses while `_reband`
  *    exists), surfacing as a stream error whose fix is to rerun the
  *    reband to convergence — a stream must never write under a
  *    half-migrated geometry.
  *
  * Geometry (`bands`/`bits`/`maxBucket`) is pinned at store creation
  * like every index update; when the corpus outgrows `bits`, stop the
  * stream, run [[EmbeddingDedupIndex.reband]], restart. Layout
  * (extends the index root):
  * {{{
  *   root/
  *     _meta.json, seg-<epoch>-batch-<id>/...  (per EmbeddingDedupIndex)
  *     pairs/seg-<epoch>-batch-<id>/           (a, b, sim, batch_id)
  * }}}
  */
object StreamingEmbeddingDedup {

  /** Start dedup-on-arrival over a vector stream with columns
    * (`idCol`, `vecCol`: array<float>). `availableNow` drains what's
    * there then stops; otherwise the query runs continuously. */
  def start(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, root: String, checkpoint: String,
      bands: Int = 10, bits: Int = 6, maxBucket: Int = 500,
      availableNow: Boolean = false): StreamingQuery = {
    val writer = vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // epoch re-read per batch from <checkpoint>/metadata — the
        // same no-driver-state rule as StreamingDedup (a same-path
        // checkpoint reset must mint a fresh epoch immediately)
        dedupBatch(batch, batchId, idCol, vecCol, dim, threshold, root,
          bands, bits, maxBucket,
          epoch = Some(StreamingDedup.checkpointEpoch(
            batch.sparkSession, checkpoint)))
        maybeCompact(batch.sparkSession, root)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** One micro-batch: detect against the store, append the segment,
    * publish the verdicts. Idempotent per (root, epoch, batchId) —
    * the [[StreamingDedup]] crash-recovery contract. */
  private[graft] def dedupBatch(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, dim: Int, threshold: Double,
      root: String, bands: Int, bits: Int, maxBucket: Int,
      epoch: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val seg = epoch match {
      case Some(e) => f"seg-$e%s-batch-$batchId%010d"
      case None => f"seg-batch-$batchId%010d"
    }
    val pairsDir = new Path(root, s"pairs/$seg")
    if (fs.exists(new Path(pairsDir, "_COMMITTED")) ||
        PairsLog.shadowedBatches(fs, root).contains(seg)) return
    val res = EmbeddingDedupIndex.update(spark, root, batch, idCol,
      vecCol, dim, threshold, bands, bits, maxBucket,
      segmentName = Some(seg))
    res.pairs.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(pairsDir.toString)
    fs.create(new Path(pairsDir, "_COMMITTED"), true).close()
  }

  /** Tiered auto-compaction on the foreachBatch forward path — same
    * trigger (`graft.dedup.autoCompactSegments`, default 32, <= 0
    * disables) and same O(recent)-per-trigger policy as
    * [[StreamingDedup.maybeCompact]]; the index side is
    * [[EmbeddingDedupIndex.compactTiered]], whose replay-pending
    * guard keeps a torn batch's segment out of any fold. */
  private[graft] def maybeCompact(spark: SparkSession, root: String): Unit = {
    val n = spark.conf.getOption("graft.dedup.autoCompactSegments")
      .map(_.toInt).getOrElse(32)
    if (n <= 0) return
    if (EmbeddingDedupIndex.segments(spark, root).size > n)
      EmbeddingDedupIndex.compactTiered(spark, root)
    if (PairsLog.committedDirs(PairsLog.fsOf(spark, root),
        PairsLog.base(root)).size > n)
      compactPairsTiered(spark, root)
  }

  /** Every near-dup verdict the stream has produced so far:
    * (a, b, sim, batch_id), canonically a < b. Verdicts naming a
    * LIVE-tombstoned id are hidden, as in
    * [[StreamingDedup.currentPairs]]. */
  def currentPairs(spark: SparkSession, root: String): DataFrame =
    tombFilter(spark, root)(PairsLog.currentPairs(spark, root,
      "a BIGINT, b BIGINT, sim DOUBLE, batch_id BIGINT"))

  /** RETRACT vectors end-to-end (pairs purge, then index tombstone) —
    * semantics, ordering and crash story exactly as
    * [[StreamingDedup.retract]]. */
  def retract(spark: SparkSession, root: String, ids: DataFrame,
      targetBytes: Long = 128L * 1024 * 1024): Option[String] =
    // one writer-lease scope over BOTH halves (reentrant through the
    // nested tombstone): a stream batch racing the purge would
    // interleave pairs-log rewrites with verdict appends
    graft.sources.Lease.withWriter(spark, root) {
      PairsLog.purgeIds(spark, root, ids, targetBytes,
        EmbeddingDedupIndex.segments(spark, root).toSet)
      EmbeddingDedupIndex.tombstone(spark, root, ids)
    }

  private def tombFilter(spark: SparkSession,
      root: String): DataFrame => DataFrame = df =>
    if (EmbeddingDedupIndex.tombSegments(spark, root).isEmpty) df
    else PairsLog.minusIds(df,
      EmbeddingDedupIndex.tombstonedIds(spark, root))

  /** Full pairs-log merge — explicit maintenance; see
    * [[StreamingDedup.compactPairs]]. */
  def compactPairs(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): Option[String] =
    graft.sources.Lease.withWriter(spark, root)(
      PairsLog.compactAll(spark, root, targetBytes,
        EmbeddingDedupIndex.segments(spark, root).toSet,
        tombFilter(spark, root)))

  /** Tiered pairs-log merge — the hot-path form; see
    * [[StreamingDedup.compactPairsTiered]]. */
  def compactPairsTiered(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      ratio: Option[Double] = None): Option[String] =
    graft.sources.Lease.withWriter(spark, root)(
      PairsLog.compactTiered(spark, root, targetBytes, ratio,
        EmbeddingDedupIndex.segments(spark, root).toSet,
        tombFilter(spark, root)))

  /** Delete unreadable pairs dirs; never while the stream runs. */
  def vacuumPairs(spark: SparkSession, root: String): Seq[String] =
    PairsLog.vacuum(spark, root)
}
