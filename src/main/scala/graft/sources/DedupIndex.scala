package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.plans.Materialize._

/** Incremental near-duplicate index — dedup-on-arrival for a
  * continuously ingested corpus, the shape a 100 TB training-data
  * pipeline actually runs: each NEW document batch is near-dup
  * checked against everything ingested so far WITHOUT re-scanning
  * the corpus, then folded into a persisted MinHash/LSH segment
  * store (reference behavior this extends: egraph's
  * egraph_detail_model upsert + reindex flow keeps indexes current
  * per write — here the "index" is the LSH band table that makes
  * similarity queries incremental too).
  *
  * Store layout (segment log, NOT merged state):
  * {{{
  *   root/
  *     _meta.json            (threshold + LSH geometry, written once)
  *     seg-<ts>-<seq>/
  *       _SUCCESS            (commit marker, written LAST)
  *       bands/              (band, bucket, id, sz parquet)
  *       sets/               (id, sh parquet)
  * }}}
  * Each update writes ONLY the batch's own rows — O(batch) bytes,
  * never O(corpus) (IncrementalAgg rewrites its merged state because
  * that state is vocabulary-sized; a dedup index is corpus-sized, so
  * the log form is the one that survives at scale). Readers union
  * the committed segments; a crash mid-write leaves a marker-less
  * directory that every reader skips (same contract as GraphStore /
  * IncrementalAgg), and the many-small-segments problem is exactly
  * what [[Compaction]] exists for — compacting `bands/` across
  * segments preserves semantics because a document's index rows
  * depend only on its own text.
  *
  * Soundness of batch-at-a-time detection: Dedup.signatures is
  * map-side pure (a doc's rows never depend on the rest of the
  * corpus), so for any near-dup pair the LATER batch finds it —
  * new×store catches cross-batch pairs, new×new catches same-batch
  * pairs — and the union over updates equals the bulk
  * Dedup.minhashNearDups over the whole corpus (pinned in
  * DedupIndexSpec).
  *
  * Per-update cost — O(batch) for state, writes AND reads: one
  * batch scan, plus three store probes that each push the batch's
  * keys into the segment scan ([[IndexLayout]] — segments are
  * bucket-/id-sorted with small row groups, so the pushed IN-list
  * prunes to ~one row group per key): the first-write-wins id check
  * (batch ids → sets scan), the band-bucket candidate join (batch
  * buckets → bands scan), and the candidate verification (candidate
  * ids → sets scan). The stored corpus text is never re-read, and
  * once the store exceeds the batch's key count in row groups, probe
  * bytes stop growing with the store.
  */
object DedupIndex {

  /** Index parameters, pinned at creation: detection quality is a
    * property of the STORE (signatures written with one geometry are
    * not comparable to signatures of another), so a mismatched
    * update must fail loudly, not silently degrade recall. */
  case class Meta(threshold: Double, numHashes: Int, bands: Int,
      probeBuckets: Int = 0, oph: Boolean = false)

  case class UpdateResult(segment: String, pairs: DataFrame)

  /** Near-dup-check `newDocs` against the store AND itself, then
    * commit the batch as a new segment. Returns the segment name and
    * the verified pairs (a, b, j) — canonically a < b, exactly the
    * bulk pipeline's contract. The pairs frame is materialized
    * BEFORE the commit so a caller observing the result can't race
    * the batch's own rows into its candidate set twice.
    *
    * `segmentName` pins the segment's identity for REPLAYED batches
    * (a streaming caller names segments by batch id): if the named
    * directory already exists — committed or torn — it is deleted
    * and rewritten, which is safe because a segment's content is a
    * pure function of the batch, and necessary so a crash-recovery
    * re-run converges instead of appending the batch's rows twice
    * (the segment-log analogue of StreamingIngest's latest-wins
    * upsert idempotence). */
  def update(spark: SparkSession, root: String, newDocs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 30, bands: Int = 6,
      segmentName: Option[String] = None): UpdateResult = {
    val meta = readOrInitMeta(spark, root,
      Meta(threshold, numHashes, bands,
        IndexLayout.defaultProbeBuckets(spark), ophConf(spark)))
    require((meta.threshold, meta.numHashes, meta.bands) ==
      ((threshold, numHashes, bands)),
      s"index at $root was built with $meta; updates must match " +
        s"(got threshold=$threshold numHashes=$numHashes bands=$bands)")
    // probe layout is store geometry too — pinned at creation
    // (IndexLayout.defaultProbeBuckets), 0 on stores created before
    // the bucketed layout existed (flat segments, unpruned probes)
    val p = meta.probeBuckets
    // single-writer lease: a concurrent update/compaction would
    // interleave shadow commits (see Lease)
    Lease.withWriter(spark, root) {
    IndexLayout.withProbePushdown(spark) {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drop a replayed segment BEFORE the store is read, so the
    // recomputed candidates see exactly the pre-batch store
    segmentName.foreach { s =>
      require(s.startsWith("seg-"), s"segment name must start with seg-: $s")
      val sp = new Path(root, s)
      if (fs.exists(sp)) fs.delete(sp, true)
    }

    // ONE listing per update (segments()/tombSegments() would each
    // re-read every _sources marker; on object storage with thousands
    // of streaming segments that metadata walk must not run several
    // times per micro-batch)
    val allSegs = ShadowLog.list(fs, rootP, "_SUCCESS",
      _.startsWith("seg-"))._1
    val segs = allSegs.filterNot(_.endsWith("-tomb"))
    val tombs = allSegs.filter(_.endsWith("-tomb"))
    // heal manifest holes ONCE, on the writer path: a pre-manifest
    // store (or a crash between a segment commit and its manifest
    // rewrite) pays its listStatus walk here exactly once, and every
    // probe after this line resolves layout from the manifest
    IndexLayout.ensureLayouts(fs, rootP, segs, Seq("bands", "sets"))
    val cap = IndexLayout.probeKeyCap(spark)

    // dropDuplicates BEFORE the store check: an at-least-once source
    // can redeliver a document INSIDE one micro-batch, and the store
    // left-anti below only filters ids already committed — without
    // this a within-batch duplicate is written twice into the
    // append-only segment (unretractable) and fans out duplicate
    // (a,b,j) rows in this and every future update. Same guard as
    // EmbeddingDedupIndex.update. A LIVE-tombstoned id is dropped
    // from the arrival too (see tombstone): its stored rows are being
    // retracted, so re-indexing it would resurrect the data
    val rawSigs = notTombstoned(spark, root, tombs, Dedup
      .signatures(newDocs, idCol, textCol, numHashes, bands, meta.oph)
      .dropDuplicates("id"), "id")
    // an id already in the store is dropped, not re-indexed: the
    // segment log cannot retract the old rows, so re-ingesting would
    // permanently double the id's bands/sets (every future batch
    // fans out against both copies) and emit degenerate (id,id)
    // self-pairs from the candidate join. First write wins — replays
    // and at-least-once sources converge; a CHANGED text under the
    // same id is an upsert, which is [[graft.sources.DocumentIngest]]
    // territory, not an append-only dedup log's.
    // The store side of the anti-join is PRUNED to the batch's own
    // ids (an id-only probe of the id-sorted sets layout) — reading
    // every committed id per batch was the r8 O(store) finding
    val batchIds = if (segs.isEmpty) None
      else IndexLayout.collectKeys(
        newDocs.select(col(idCol)).distinct(), p, cap, "batch ids")
    val sigs = (if (segs.isEmpty) rawSigs
      else rawSigs.join(probeSets(spark, root, segs, p, batchIds)
          .select(col("id")),
        Seq("id"), "left_anti")).materialize()
    val newBands = sigs.select(col("id"), col("sz"),
      posexplode(col("ba")).as(Seq("band", "bucket")))
    val newSets = sigs.select(col("id"), col("sh"))

    // fresh store: empty frames derived from the BATCH's own schema,
    // so non-bigint id columns work on the first update too (the
    // public currentBands/currentSets readers default to the
    // documents-table shape). A non-empty store's bands scan is
    // pruned to the batch's touched buckets — minhash band buckets
    // are 64-bit hashes, so the bucket IN-list alone is exact
    val batchBuckets = if (segs.isEmpty) None
      else IndexLayout.collectKeys(
        newBands.select(col("bucket")).distinct(), p, cap, "band buckets")
    // tombstoned store rows are filtered out of candidate generation
    // (a retracted id must never appear in new pairs); the sets reads
    // need no filter — candidates can no longer name a tombstoned id
    val storeBands = if (segs.isEmpty) newBands.limit(0)
      else notTombstoned(spark, root, tombs,
        probeBands(spark, root, segs, p, batchBuckets), "id")

    // size-ratio guard (J ≥ t ⇒ min/max set sizes ≥ t) kills
    // impossible pairs before verification, same as the bulk path
    def sizeOk(sa: org.apache.spark.sql.Column,
        sb: org.apache.spark.sql.Column) =
      least(sa, sb).cast("double") / greatest(sa, sb) >= threshold
    // cross-batch candidates: the join is keyed on (band, bucket) and
    // its output volume is driven by the NEW batch's buckets — the
    // store side is only probed where the batch collides
    val candOld = newBands.as("x")
      .join(storeBands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .filter(sizeOk(col("x.sz"), col("y.sz")))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
    // same-batch candidates
    val candNew = newBands.as("x")
      .join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .filter(sizeOk(col("x.sz"), col("y.sz")))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    // distinct(), not the bulk path's first-matching-band when-chain:
    // that trick needs both band ARRAYS on the pair row, which would
    // mean carrying them in the band store; here the candidate stream
    // is batch-driven (not corpus-driven), so one distinct shuffle of
    // it is the cheaper trade. Materialized: the verification join
    // AND the candidate-id collect below both read it
    val cands = candOld.unionByName(candNew).distinct().materialize()
    // verification reads the sets store pruned to the CANDIDATE ids
    // (batch-driven by construction) — the corpus-token-scale
    // ARRAY<BIGINT> payloads were the heaviest part of the r8
    // full-store read
    val candIds = if (segs.isEmpty) None
      else IndexLayout.collectKeys(
        cands.select(explode(array(col("a"), col("b"))).as("id"))
          .distinct(), p, cap, "candidate ids")
    val storeSets = if (segs.isEmpty) newSets.limit(0)
      else probeSets(spark, root, segs, p, candIds)
    val allSets = storeSets.unionByName(newSets)
    val pairs = cands
      .join(allSets.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(allSets.select(col("id").as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"),
        round(graft.functions.Registry.jaccardSorted(
          col("sha"), col("shb")), 4).as("j"))
      .filter(col("j") >= threshold)
      .materialize()

    // commit LAST: bands + sets land, then the root-level marker —
    // a crash before the marker leaves an ignored orphan directory.
    // Segments are written key-sorted with probe-sized row groups —
    // the layout every future batch's pruned probes depend on
    val seg = segmentName.getOrElse(f"seg-${System.currentTimeMillis()}%013d-${
      saveSeq.incrementAndGet()}%04d")
    // batch segments are the flat-sorted L0 tail — only compaction
    // writes the P-way bucketed form (see IndexLayout)
    IndexLayout.writeSorted(newBands, "bucket", s"$root/$seg/bands", 0)
    IndexLayout.writeSorted(newSets, "id", s"$root/$seg/sets", 0)
    fs.create(new Path(root, s"$seg/_SUCCESS"), true).close()
    // manifest AFTER the marker: a crash in between leaves a hole the
    // next update heals, never a manifest entry for an invisible dir
    IndexLayout.recordLayouts(fs, new Path(root),
      Map(seg -> Map("bands" -> Nil, "sets" -> Nil)), segs :+ seg)
    UpdateResult(seg, pairs)
    }
    }
  }

  /** Bulk-load documents into the index WITHOUT near-dup detection —
    * the bootstrap path: seeding dedup-on-arrival over an
    * already-curated corpus needs the corpus INDEXED (so future
    * arrivals check against it) but not re-verified against itself
    * (at 100 TB the historical pair set is either already known or
    * not wanted). One signature pass + one sorted segment write,
    * O(batch) like update() but with no candidate join, no
    * verification read and no pairs; ids already in the store are
    * dropped (same first-write-wins contract), geometry is pinned by
    * the same `_meta.json` check, and the committed segment is
    * indistinguishable from an update()'s — a subsequent update()
    * detects against it identically (pinned in DedupIndexSpec). */
  def bulkLoad(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      numHashes: Int = 30, bands: Int = 6): String = {
    val meta = readOrInitMeta(spark, root,
      Meta(threshold, numHashes, bands,
        IndexLayout.defaultProbeBuckets(spark), ophConf(spark)))
    require((meta.threshold, meta.numHashes, meta.bands) ==
      ((threshold, numHashes, bands)),
      s"index at $root was built with $meta; loads must match " +
        s"(got threshold=$threshold numHashes=$numHashes bands=$bands)")
    val p = meta.probeBuckets
    Lease.withWriter(spark, root) {
    IndexLayout.withProbePushdown(spark) {
      val segs = segments(spark, root)
      val tombs = tombSegments(spark, root)
      val cap = IndexLayout.probeKeyCap(spark)
      val rawSigs = notTombstoned(spark, root, tombs, Dedup
        .signatures(docs, idCol, textCol, numHashes, bands, meta.oph)
        .dropDuplicates("id"), "id")
      val batchIds = if (segs.isEmpty) None
        else IndexLayout.collectKeys(
          docs.select(col(idCol)).distinct(), p, cap, "batch ids")
      val sigs = (if (segs.isEmpty) rawSigs
        else rawSigs.join(probeSets(spark, root, segs, p, batchIds)
            .select(col("id")),
          Seq("id"), "left_anti")).materialize()
      val newBands = sigs.select(col("id"), col("sz"),
        posexplode(col("ba")).as(Seq("band", "bucket")))
      val seg = f"seg-${System.currentTimeMillis()}%013d-${
        saveSeq.incrementAndGet()}%04d"
      // bulk loads write the flat-sorted form too: a bootstrap is a
      // few large loads + one compactSegments (which buckets)
      IndexLayout.writeSorted(newBands, "bucket", s"$root/$seg/bands", 0)
      IndexLayout.writeSorted(sigs.select(col("id"), col("sh")), "id",
        s"$root/$seg/sets", 0)
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.create(new Path(root, s"$seg/_SUCCESS"), true).close()
      IndexLayout.recordLayouts(fs, new Path(root),
        Map(seg -> Map("bands" -> Nil, "sets" -> Nil)), segs :+ seg)
      seg
    }
    }
  }

  /** The per-batch store probes — the EXACT reads update() issues,
    * exposed package-private so PlanAuditSpec can pin their shape
    * (per-bucket scans, PushedFilters eq-chains, page-level pruning)
    * without replicating the code under test. */
  private[graft] def probeBands(spark: SparkSession, root: String,
      segs: Seq[String], p: Int,
      buckets: Option[Array[(Any, Int)]]): DataFrame =
    probeTable(spark, root, segs, "bands",
      "band INT, bucket BIGINT, id BIGINT, sz INT", "bucket", p, buckets)

  private[graft] def probeSets(spark: SparkSession, root: String,
      segs: Seq[String], p: Int,
      ids: Option[Array[(Any, Int)]]): DataFrame =
    probeTable(spark, root, segs, "sets",
      "id BIGINT, sh ARRAY<BIGINT>", "id", p, ids)

  /** The probe plan (see IndexLayout): flat L0 segments get ONE scan
    * with the full key chain; bucketed (compacted) segments get
    * grouped per-bucket scans, each pushing its own short chain. */
  private def probeTable(spark: SparkSession, root: String,
      segs: Seq[String], table: String, ddl: String, keyCol: String,
      p: Int, keys: Option[Array[(Any, Int)]]): DataFrame = keys match {
    case None => readSegments(spark, root, segs, table, ddl)
    case Some(ks) if ks.isEmpty =>
      readSegments(spark, root, Nil, table, ddl)
    case Some(ks) =>
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // layout resolution is ONE manifest read (see IndexLayout) —
      // a segment missing from it (pre-manifest store, torn manifest
      // write) costs one listStatus here, resolved once per probe
      val rootP = new Path(root)
      val cached = IndexLayout.readLayouts(fs, rootP)
      val dirsBySeg = segs.map(s => s ->
        IndexLayout.layoutFor(fs, rootP, cached, s, table)).toMap
      val lay: IndexLayout.SegLayouts =
        dirsBySeg.map { case (s, ds) => s -> Map(table -> ds) }
      val (bucketed, flat) = segs.partition(s => dirsBySeg(s).nonEmpty)
      val allKeys = ks.map(_._1)
      val tail = if (flat.isEmpty) Nil
        else Seq(readSegments(spark, root, flat, table, ddl,
            layouts = Some(lay))
          .where(IndexLayout.chain(spark, keyCol, allKeys)))
      val bulk = if (bucketed.isEmpty) Nil
        else if (p <= 0)
          Seq(readSegments(spark, root, bucketed, table, ddl,
              layouts = Some(lay))
            .where(IndexLayout.chain(spark, keyCol, allKeys)))
        else IndexLayout.scanGroups(spark, ks).map { case (dirs, gks) =>
          readSegments(spark, root, bucketed, table, ddl, subs = dirs,
              layouts = Some(lay))
            .where(IndexLayout.chain(spark, keyCol, gks))
        }
      (tail ++ bulk) match {
        case Nil => readSegments(spark, root, Nil, table, ddl)
        case parts => parts.reduce(_ unionByName _)
      }
  }

  /** All committed, non-retracted band rows (band, bucket, id, sz);
    * empty when the store is new. */
  def currentBands(spark: SparkSession, root: String): DataFrame =
    notTombstoned(spark, root, tombSegments(spark, root),
      readSegments(spark, root, segments(spark, root), "bands",
        "band INT, bucket BIGINT, id BIGINT, sz INT"), "id")

  /** All committed, non-retracted shingle sets (id, sh); empty when
    * the store is new. */
  def currentSets(spark: SparkSession, root: String): DataFrame =
    notTombstoned(spark, root, tombSegments(spark, root),
      readSegments(spark, root, segments(spark, root), "sets",
        "id BIGINT, sh ARRAY<BIGINT>"), "id")

  /** Committed, unshadowed DATA segments (tombstone segments are
    * listed by [[tombSegments]]). A compacted segment's `_sources`
    * file names the segments it replaced; those stay EXCLUDED even if
    * their directories still exist (a crash between the compaction
    * commit and the source cleanup leaves them behind — shadowing
    * makes that window invisible to readers instead of double-counted;
    * [[vacuumShadowed]] reclaims them). Protocol: [[ShadowLog]]. */
  def segments(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ShadowLog.list(fs, p, "_SUCCESS", _.startsWith("seg-"))._1
      .filterNot(_.endsWith("-tomb"))
  }

  /** Committed, unshadowed TOMBSTONE segments — see [[tombstone]]. */
  private[graft] def tombSegments(spark: SparkSession,
      root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ShadowLog.list(fs, p, "_SUCCESS", _.startsWith("seg-"))._1
      .filter(_.endsWith("-tomb"))
  }

  /** RETRACT documents from the index — the one lifecycle operation
    * an append-only segment log cannot express in place, and a hard
    * requirement of real corpora (opt-out and licensing deletions).
    * Writes the ids as a small committed `seg-…-tomb` segment (one
    * id-sorted `ids` table, same marker/shadow conventions); readers
    * and probes anti-join it, and compaction APPLIES it:
    *
    *  - while a tombstone is LIVE, the id's stored rows are invisible
    *    to every reader and probe (it can never appear in new pairs),
    *    and a re-arrival of the id is dropped like a duplicate;
    *  - a compaction that covers EVERY data segment rewrites the
    *    store without the id's rows and drops the tombstone with the
    *    sources it shadowed (partial/tiered folds apply the filter to
    *    what they merge but keep the tombstone — rows may survive in
    *    unmerged segments);
    *  - cost stays O(batch) per update: the live tombstone set is
    *    deletion-request-sized (it drains at every full compaction),
    *    read whole and anti-joined — no probe shape changes.
    *
    * A tombstone retracts PAST data and blocks the id while live; it
    * is not a permanent ban — once applied and dropped, a future
    * re-ingestion of the same id is a fresh document (re-consent).
    * Returns the segment name, or None for an empty id set. */
  def tombstone(spark: SparkSession, root: String,
      ids: DataFrame): Option[String] = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(root, "_meta.json")),
      s"no index at $root")
    val idDf = ids.select(col(ids.columns.head).as("id")).distinct()
    if (idDf.isEmpty) None
    else Lease.withWriter(spark, root) {
      val seg = f"seg-${System.currentTimeMillis()}%013d-${
        saveSeq.incrementAndGet()}%04d-tomb"
      IndexLayout.writeSorted(idDf, "id", s"$root/$seg/ids", 0)
      fs.create(new Path(root, s"$seg/_SUCCESS"), true).close()
      Some(seg)
    }
  }

  /** The live (unapplied) tombstoned ids — empty when none. */
  def tombstonedIds(spark: SparkSession, root: String): DataFrame =
    tombIdsOf(spark, root, tombSegments(spark, root))

  private def tombIdsOf(spark: SparkSession, root: String,
      tombs: Seq[String]): DataFrame =
    if (tombs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"))
    else spark.read.parquet(tombs.map(s => s"$root/$s/ids"): _*)
      .select("id").distinct()

  /** `df` minus rows whose `idColName` is live-tombstoned; skips the
    * join entirely when no tombstone segment exists (the common
    * case — this is the forward path). */
  private def notTombstoned(spark: SparkSession, root: String,
      tombs: Seq[String], df: DataFrame, idColName: String): DataFrame =
    if (tombs.isEmpty) df
    else df.join(
      tombIdsOf(spark, root, tombs).select(col("id").as(idColName)),
      Seq(idColName), "left_anti")

  /** Merge every committed segment into ONE compacted segment — the
    * janitorial pass the segment-log form requires at scale: a
    * streaming writer ([[graft.streaming.StreamingDedup]]) commits one
    * segment per micro-batch, and at 100 TB that is thousands of
    * KB-scale parquet directories whose per-file open/footer cost
    * dominates the store probe long before data volume does (same
    * disease [[Compaction]] treats for plain tables). Semantics are
    * preserved by construction: a document's band/set rows depend only
    * on its own text, so unioning rows across segments and rewriting
    * them into byte-targeted files changes file layout, never content.
    *
    * Crash-safe swap, matching the store's marker conventions: the
    * merged bands/sets land in a fresh `seg-` dir, `_sources` (the
    * replaced segment names) is written, then `_SUCCESS` LAST — the
    * instant the marker exists the sources are shadowed (see
    * [[segments]]), so readers never see a double-counted or partial
    * store; source directories are deleted after the commit, and a
    * crash inside that cleanup just leaves shadowed dirs for
    * [[vacuumShadowed]]. Returns the new segment name, or None when
    * there is nothing to merge.
    *
    * Replay-pending guard (ENFORCED, not advisory): a streaming
    * batch ([[graft.streaming.StreamingDedup]]) commits its index
    * segment BEFORE its verdict log — a crash in between leaves a
    * committed `…-batch-…` segment whose recovery will delete and
    * rewrite it. Folding such a segment into a compaction target
    * would let that rewrite re-append the batch's rows NEXT TO the
    * compacted copy (double-counting the batch forever). So any
    * source segment with `-batch-` in its name whose verdicts are
    * not committed under `root/pairs` (neither a `_COMMITTED`
    * marker nor shadowed by a committed pairs compaction) is
    * EXCLUDED from this pass — compaction is now safe to run in the
    * crash-recovery window, it simply leaves the replay-pending
    * segment alone until its batch commits. */
  /** `force` rewrites even a SINGLE segment — a no-op for merging,
    * but the migration path for layout changes (probe-bounded pages,
    * `graft.dedup.pageRows`): a store bulk-loaded before a layout fix
    * is often one big compacted segment, which the `< 2` fast path
    * would otherwise never touch. */
  def compactSegments(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      force: Boolean = false): Option[String] =
    Lease.withWriter(spark, root) {
      val (all, shadowed, srcs, tombs) = eligibleSources(spark, root)
      if (srcs.size < (if (force) 1 else 2)) None
      else mergeSources(spark, root, all, shadowed, srcs, tombs,
        targetBytes)
    }

  /** Tiered (size-ratio) compaction — the HOT-PATH form
    * [[graft.streaming.StreamingDedup]]'s auto-compaction runs: folds
    * only segments the [[Compaction.tieredPick]] policy selects, so a
    * trigger costs O(recent tail), never a full-store rewrite (the
    * r9 ADVICE defect — full compaction every ~32 micro-batches is
    * amortized O(store/n) per batch, unbounded as the store grows;
    * under the ratio policy each row is rewritten
    * O(log_ratio(store/batch)) times total). Same commit protocol,
    * shadow closure, replay-pending guard and layout preservation as
    * [[compactSegments]], which remains the explicit full-merge
    * maintenance call. `ratio` defaults from
    * `graft.dedup.compactRatio` (4.0). */
  def compactTiered(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      ratio: Option[Double] = None): Option[String] =
    Lease.withWriter(spark, root) {
    val (all, shadowed, srcs, tombs) = eligibleSources(spark, root)
    if (srcs.size < 2) None
    else {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one size listing per TRIGGER (not per batch — triggers fire
    // every ~autoCompactSegments batches, so this stays amortized)
    val sized = srcs.map(s =>
      s -> fs.getContentSummary(new Path(p, s)).getLength)
    val r = ratio.getOrElse(
      spark.conf.getOption("graft.dedup.compactRatio")
        .map(_.toDouble).getOrElse(4.0))
    val pick = Compaction.tieredPick(sized, r)
    if (pick.size < 2) None
    else mergeSources(spark, root, all, shadowed, pick, tombs, targetBytes)
    }
    }

  /** (visible committed data segments, shadowed set, compactable
    * subset, live tombstone segments): the replay-pending guard
    * shared by both compaction forms. */
  private def eligibleSources(spark: SparkSession, root: String)
      : (Seq[String], Set[String], Seq[String], Seq[String]) = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (allWithTombs, shadowed) =
      ShadowLog.list(fs, p, "_SUCCESS", _.startsWith("seg-"))
    val tombs = allWithTombs.filter(_.endsWith("-tomb"))
    val all = allWithTombs.filterNot(_.endsWith("-tomb"))
    // replay-pending detection keys on the EXACT StreamingDedup
    // naming pattern, not any "-batch-" substring (r8 ADVICE): a
    // direct update() caller who picks a custom name containing
    // "-batch-" but never writes a pairs log would otherwise have
    // segments that are never compactable (a liveness leak)
    def isStreamSeg(s: String) = StreamingBatchSegment.matches(s)
    val pairsBase = new Path(root, "pairs")
    val replayPending: Set[String] =
      if (!all.exists(isStreamSeg)) Set.empty
      else if (!fs.exists(pairsBase))
        // streaming batch segments exist but NO pairs log does: the
        // very first streaming batch crashed between its segment
        // commit and its first pairs write. That is exactly the
        // recovery window — every batch segment is replay-pending,
        // none may be folded (the old `Set.empty` here would have
        // compacted the torn segment away and the replay's left-anti
        // would then drop the whole batch's verdicts forever)
        all.filter(isStreamSeg).toSet
      else {
        val (vis, shad) = ShadowLog.list(fs, pairsBase, "_COMMITTED", _ => true)
        val pairsCommitted = vis.toSet ++ shad
        all.filter(s => isStreamSeg(s) && !pairsCommitted(s)).toSet
      }
    (all, shadowed, all.filterNot(replayPending), tombs)
  }

  /** Merge `srcs` into one fresh segment under the crash-safe shadow
    * protocol (see [[compactSegments]]'s scaladoc for the full
    * contract). `srcs` may be any eligible subset — tiered folds pass
    * the policy's pick, the full form passes everything. Live
    * tombstones are APPLIED to the merged rows; when the merge covers
    * EVERY data segment the tombstones are drained too (shadowed with
    * the sources and deleted — nothing is left for them to retract),
    * while a partial fold keeps them (rows may survive in unmerged
    * segments). */
  private def mergeSources(spark: SparkSession, root: String,
      all: Seq[String], shadowed: Set[String], srcs: Seq[String],
      tombs: Seq[String], targetBytes: Long): Option[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val coversAll = all.toSet == srcs.toSet
    val seg = f"seg-${System.currentTimeMillis()}%013d-${
      saveSeq.incrementAndGet()}%04d-compact"
    // merged tables are re-sorted and re-bucketed by their probe
    // key: compaction must PRESERVE the pruned-probe layout
    // (IndexLayout, P from the store's pinned meta) — a merged store
    // that lost it would silently reintroduce the O(store) per-batch
    // scan this layout exists to prevent
    val pBuckets = metaProbeBuckets(spark, root)
    for ((table, key, ddl) <- Seq(
        ("bands", "bucket", "band INT, bucket BIGINT, id BIGINT, sz INT"),
        ("sets", "id", "id BIGINT, sh ARRAY<BIGINT>"))) {
      val paths = srcs.map(s => s"$root/$s/$table")
      val pl = Compaction.planAll(spark, paths, targetBytes)
      // bucket only when the merged table can fill the buckets
      // (≥ ~one probe-sized row group per dir): a small store split
      // P ways would EXPLODE its file count — the many-small-files
      // disease compaction exists to cure. Below the bar the merged
      // segment stays flat-sorted; probes treat it as L0 tail, which
      // at that size is the right plan anyway.
      val p = if (pl.nBytes >=
          pBuckets.toLong * IndexLayout.blockBytes(spark)) pBuckets
        else 0
      // compaction APPLIES live tombstones: the merged copy is the
      // first chance to physically drop a retracted id's rows
      IndexLayout.writeSorted(
        notTombstoned(spark, root, tombs,
          readSegments(spark, root, srcs, table, ddl), "id"), key,
        s"$root/$seg/$table", p, nOut = Some(pl.nOut))
    }
    // a covering merge drains the tombstones with its sources: every
    // row they could retract is gone from the merged copy, so they
    // are shadowed and deleted like any replaced segment. A partial
    // fold keeps them — unmerged segments may still hold the rows.
    val drained = if (coversAll) tombs else Nil
    // closure, not just srcs: see ShadowLog — dropping a prior
    // compaction target must not resurrect its crash relics
    ShadowLog.writeSources(fs, p, seg,
      ShadowLog.sourcesClosure(fs, p, srcs ++ drained, shadowed))
    fs.create(new Path(root, s"$seg/_SUCCESS"), true).close()
    // manifest: which bp dirs the bucketed write actually created
    // (partitionBy materializes only non-empty buckets) — discovered
    // with one listStatus per table HERE, at write time, so no probe
    // ever pays it
    IndexLayout.recordLayouts(fs, p,
      Map(seg -> Seq("bands", "sets").map(t =>
        t -> IndexLayout.listBp(fs, new Path(root, s"$seg/$t"))).toMap),
      all.filterNot(srcs.toSet) :+ seg)
    (srcs ++ drained).foreach(s => fs.delete(new Path(root, s), true))
    Some(seg)
  }

  /** Delete segment directories no reader can see: compaction sources
    * a crashed cleanup left behind (committed but shadowed) and
    * marker-less crash orphans. Readers are never affected; like
    * every mutation here it assumes the store's single-maintenance-
    * writer discipline (a concurrent update's not-yet-committed dir
    * looks exactly like a crash orphan). */
  def vacuumShadowed(spark: SparkSession, root: String): Seq[String] =
    Lease.withWriter(spark, root) {
      val p = new Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      ShadowLog.vacuum(fs, p, "_SUCCESS", _.startsWith("seg-"))
    }

  /** Union read of the committed segments' `table` dirs. `subs`
    * narrows to bucket subdirectories (e.g. "bp=7") — a segment
    * without that subdir (no rows routed there) is skipped; bucketed
    * segments read WITHOUT `subs` surface their `bp` partition
    * column, dropped so every reader sees the flat schema. Layout
    * (bucketed vs flat, which bp dirs exist) comes from the store's
    * `_layouts` manifest — one small read, or the caller's
    * already-resolved map — with a per-segment listStatus fallback
    * for manifest misses; no per-(segment × dir) exists calls. */
  private def readSegments(spark: SparkSession, root: String,
      segs: Seq[String], table: String, emptyDdl: String,
      subs: Seq[String] = Nil,
      layouts: Option[IndexLayout.SegLayouts] = None): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(emptyDdl))
    segs match {
      case Nil => empty
      case ss =>
        val fs = new Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val rootP = new Path(root)
        val lay = layouts.getOrElse(IndexLayout.readLayouts(fs, rootP))
        def bps(s: String): Seq[String] =
          IndexLayout.layoutFor(fs, rootP, lay, s, table)
        // bucketed segments are read by their LEAF dirs, never via
        // partition discovery: multiple segment roots each holding
        // bp=* dirs trip CONFLICTING_DIRECTORY_STRUCTURES, and the
        // bp value is write-time routing metadata no reader needs
        val paths =
          if (subs.nonEmpty)
            ss.flatMap { s =>
              val have = bps(s).toSet
              subs.filter(have).map(d => s"$root/$s/$table/$d")
            }
          else ss.flatMap { s =>
            val ds = bps(s)
            if (ds.isEmpty) Seq(s"$root/$s/$table")
            else ds.map(d => s"$root/$s/$table/$d")
          }
        if (paths.isEmpty) empty
        else spark.read.parquet(paths: _*)
    }
  }

  /** The store's pinned probe-bucket count; 0 when the meta file is
    * absent or predates the field (legacy flat layout). */
  private def metaProbeBuckets(spark: SparkSession, root: String): Int = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val mp = new Path(root, "_meta.json")
    if (!fs.exists(mp)) 0
    else {
      val in = fs.open(mp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      """"probeBuckets":(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toInt).getOrElse(0)
    }
  }

  /** Signature-scheme choice, read ONCE at store creation and pinned
    * in `_meta.json` — a store probed with a different scheme than it
    * was built with is a silent recall hole, so the conf never
    * applies to an existing store. */
  private def ophConf(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.minhash.oph")
      .exists(_.trim.equalsIgnoreCase("true"))

  private def readOrInitMeta(spark: SparkSession, root: String,
      init: Meta): Meta = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val mp = new Path(root, "_meta.json")
    if (fs.exists(mp)) {
      val in = fs.open(mp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      // three numeric fields, fixed order (written below) — a full
      // JSON parser dependency is not warranted for a marker file.
      // The threshold charset admits scientific notation: Scala
      // renders e.g. 1.0E-4 in exponent form, and a store created
      // with such a threshold must stay readable
      // probeBuckets optional: absent = a store created before the
      // bucketed probe layout existed = flat segments (0)
      // oph optional too: absent = a store created before the
      // one-permutation option existed = classic k-pass signatures
      val m = """\{"threshold":([0-9.eE+-]+),"numHashes":(\d+),"bands":(\d+)(?:,"probeBuckets":(\d+))?(?:,"oph":(true|false))?\}"""
        .r.findFirstMatchIn(txt.trim)
        .getOrElse(throw new IllegalStateException(
          s"unreadable dedup-index meta at $mp: $txt"))
      Meta(m.group(1).toDouble, m.group(2).toInt, m.group(3).toInt,
        Option(m.group(4)).map(_.toInt).getOrElse(0),
        Option(m.group(5)).exists(_.toBoolean))
    } else {
      fs.mkdirs(new Path(root))
      val out = fs.create(mp, false) // fail on concurrent create
      try out.write(
        s"""{"threshold":${init.threshold},"numHashes":${init.numHashes},"bands":${init.bands},"probeBuckets":${init.probeBuckets},"oph":${init.oph}}"""
          .getBytes("UTF-8"))
      finally out.close()
      init
    }
  }

  /** The segment names [[graft.streaming.StreamingDedup]] commits —
    * `seg-<epoch>-batch-<id>` (epoch = 8 hex chars of the query id)
    * or the legacy pre-epoch `seg-batch-<id>`. This regex IS the
    * naming contract: compactSegments' replay-pending guard and
    * compactPairs' retain predicate key on it, so only genuinely
    * streaming-named segments are held back for crash recovery — a
    * direct update() caller's custom name can't get stuck pending. */
  private[graft] val StreamingBatchSegment =
    """seg-(?:[0-9a-fA-F]{8}-)?batch-\d{10}""".r

  private val saveSeq = new java.util.concurrent.atomic.AtomicLong()
}
