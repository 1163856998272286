package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Probe-prunable layout for the incremental dedup stores
  * ([[DedupIndex]], [[EmbeddingDedupIndex]]) — the mechanism that
  * makes the per-micro-batch store READ O(batch), matching what the
  * protocol already guaranteed for state and writes.
  *
  * The problem (r8 finding): segments were plain unsorted parquet,
  * so although the candidate JOIN's output is batch-driven, its
  * store-side SCAN read every band row and every shingle-set/vector
  * payload ever committed — an O(corpus) read per micro-batch that
  * at 100 TB re-reads a corpus-sized store every minute.
  *
  * The fix is two cooperating halves, both here so the write path,
  * the probe path and compaction stay in one contract:
  *
  *  1. '''Sorted segments''' ([[writeSorted]]): every segment table
  *     is range-partitioned and sorted by its probe key (`bucket`
  *     for band tables, `id` for sets/vecs) and written with small
  *     row groups (`graft.dedup.blockBytes`, default 1 MiB), so
  *     parquet row-group min/max statistics and the page-level
  *     column index describe tight, disjoint key ranges.
  *  2. '''Key-pushdown probes''' ([[collectKeys]] + [[pruned]]): the
  *     batch's touched keys (bucket values / candidate ids) are
  *     batch-bounded, so they are collected and pushed into the
  *     store scan. Predicate FORM matters, measured on this host:
  *     Spark's parquet-native In predicate (what a >10-value `isin`
  *     pushes by default) is evaluated against row-group statistics
  *     by the set's min/max ENVELOPE only — for hash-spread keys
  *     that envelope covers the whole store and prunes nothing
  *     (240k-row sorted store, 600 spread keys: 240k rows decoded).
  *     An OR-of-EqualTo chain is evaluated per key against
  *     row-group stats AND the page-level column index, and prunes
  *     exactly (same store: ~1.5k rows decoded per key, constant as
  *     the store grows — 893k of 2.4M rows for 600 keys, the same
  *     ~893k at any larger store). So [[pruned]] pushes the keys as
  *     a BALANCED OR-tree of ≤[[probeChainLen]]-value `isin` chunks
  *     — each chunk converts to an eq-chain under the (temporarily
  *     raised, [[withProbePushdown]]) conversion threshold, and the
  *     balanced tree keeps expression/visitor recursion at
  *     O(chainLen + log chunks) instead of a stack-breaking
  *     O(total keys) left-deep chain.
  *
  * Cost model at 100 TB: a probe of `v` distinct keys decodes ~2-3
  * pages per key — O(batch × pageBytes), INDEPENDENT of store size
  * once the store exceeds the batch's key count in pages; the
  * per-row-group predicate evaluation is `v` comparisons against
  * footer stats, distributed across the scan's tasks. Old stores
  * (written unsorted by earlier builds) stay fully correct — the
  * pushed filter is semantically the join's own key predicate, sort
  * order only decides whether statistics can prune — they just keep
  * paying the full scan until segments are rewritten by compaction
  * (which preserves this layout).
  *
  * The key collect is driver-side, so it is capped
  * (`graft.dedup.probeKeyCap`, default 1,000,000 keys ≈ 8 MB of
  * longs): a batch over the cap — a bulk-load-shaped batch, where a
  * full store scan is amortized over a corpus-scale batch anyway —
  * falls back to the unpruned read WITH a logged warning (the
  * repo's no-silent-caps convention).
  */
object IndexLayout {

  private val log = LoggerFactory.getLogger(getClass)

  /** Target parquet row-group bytes for index segments — small row
    * groups are what give the key-pushdown probe its pruning
    * granularity (one probed key costs one row group). 1 MiB keeps
    * the per-key probe cost ~1 MB while a 100 TB store still holds
    * its footer metadata in the low GBs. */
  def blockBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.dedup.blockBytes").map(_.toLong)
      .getOrElse(1L << 20)

  /** Max keys collected to the driver for a pruned probe; above it
    * the probe falls back to the unpruned scan (logged). */
  def probeKeyCap(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("graft.dedup.probeKeyCap").map(_.toInt)
      .getOrElse(1000000)

  /** Write `df` range-partitioned + sorted by `sortCol` with
    * probe-sized row groups — the layout [[pruned]] reads. `nOut`
    * pins the output file count (compaction); updates leave it to
    * AQE (a micro-batch coalesces to few files). */
  def writeSorted(df: DataFrame, sortCol: String, path: String,
      nOut: Option[Int] = None): Unit = {
    val bb = blockBytes(df.sparkSession)
    val ranged = nOut match {
      case Some(n) => df.repartitionByRange(n, col(sortCol))
      case None => df.repartitionByRange(col(sortCol))
    }
    ranged.sortWithinPartitions(sortCol)
      .write.option("parquet.block.size", bb)
      .option("parquet.page.size", math.max(16L * 1024, bb / 8))
      .parquet(path)
  }

  /** Per-`isin`-chunk key count — each chunk is pushed as an
    * OR-of-eq chain, so this bounds predicate/visitor recursion
    * depth (1000 frames is safe on default JVM stacks; the balanced
    * OR-tree above the chunks adds only log₂(chunks)). */
  def probeChainLen(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("graft.dedup.probeChainLen").map(_.toInt)
      .getOrElse(1000)

  /** The batch's touched keys, collected for pushdown — None when
    * the batch exceeds the cap (caller reads unpruned; warned). */
  def collectKeys(keys: DataFrame, cap: Int, what: String): Option[Array[Any]] = {
    val rows = keys.limit(cap + 1).collect()
    if (rows.length > cap) {
      log.warn(s"dedup-index probe: batch touches > $cap $what — " +
        "falling back to an unpruned store scan for this update " +
        "(raise graft.dedup.probeKeyCap if this batch size is routine)")
      None
    } else Some(rows.map(_.get(0)))
  }

  /** Store scan restricted to the batch's keys: semantically the
    * `isin` the join would apply anyway, shaped as a balanced
    * OR-tree of ≤[[probeChainLen]]-key chunks so the parquet scan
    * prunes per key (see the object doc's predicate-form note). */
  def pruned(store: DataFrame, keyCol: String,
      keys: Option[Array[Any]]): DataFrame = keys match {
    case Some(ks) if ks.isEmpty => store.limit(0)
    case Some(ks) =>
      val chunk = probeChainLen(store.sparkSession)
      val parts = ks.grouped(chunk)
        .map(g => col(keyCol).isin(g.toIndexedSeq: _*)).toIndexedSeq
      def bal(lo: Int, hi: Int): Column =
        if (lo == hi) parts(lo)
        else { val m = (lo + hi) / 2; bal(lo, m) || bal(m + 1, hi) }
      store.where(bal(0, parts.length - 1))
    case None => store
  }

  /** Run `f` with the In→eq-chain parquet conversion threshold
    * raised to [[probeChainLen]]: Spark's default (10) pushes larger
    * IN-lists as a native In predicate, whose statistics evaluation
    * is envelope-only and prunes nothing for hash-spread keys. Both
    * index updates plan and MATERIALIZE every probe-dependent frame
    * inside this scope; the previous value is restored after (other
    * queries planned concurrently in the same session would see
    * eq-chains for 11..chainLen-value IN-lists — harmless, pushdown
    * of those is strictly more precise). */
  def withProbePushdown[T](spark: org.apache.spark.sql.SparkSession)(
      f: => T): T = {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, math.max(probeChainLen(spark),
      prev.map(_.toInt).getOrElse(10)).toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
