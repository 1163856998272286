package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.DedupIndex
import graft.streaming.StreamingDedup

/** Dedup-on-arrival through the streaming surface: the pairs the
  * stream accumulates equal the bulk pipeline over the same corpus,
  * and a replayed micro-batch (foreachBatch's crash-recovery unit)
  * leaves the store and the verdict log unchanged. */
class StreamingDedupSpec extends AnyFunSuite with SparkFixture {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed batches find exactly the bulk pipeline's pairs; " +
      "batch replay is exactly-once on the store and the verdict log") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val third = rows.length / 3
    val base = "/tmp/graft-test-streamdedup"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"; val ckpt = s"$base/ckpt"

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    def drain(): Unit = {
      val q = StreamingDedup.start(stream, "doc_id", "text",
        threshold = 0.8, root, ckpt, availableNow = true)
      q.awaitTermination()
    }
    // three arrivals across two separate query runs: pairs exist both
    // inside and across these id ranges (~12% planted near-dups), and
    // the second run must resume from the checkpoint, not reprocess
    mem.addData(rows.take(third).toSeq)
    drain()
    mem.addData(rows.slice(third, 2 * third).toSeq)
    mem.addData(rows.drop(2 * third).toSeq)
    drain()

    val found = pairSet(StreamingDedup.currentPairs(spark, root))
    val bulk = pairSet(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
    assert(bulk.nonEmpty, "corpus must contain near-dups for this test")
    assert(found == bulk,
      s"streamed != bulk: missing=${(bulk -- found).take(5)} " +
        s"extra=${(found -- bulk).take(5)}")
    // every doc indexed exactly once across the micro-batch segments
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)

    // crash-recovery replay: re-deliver the LAST batch by hand with
    // the same batch id — the committed pairs marker short-circuits,
    // leaving segments, index rows and verdicts bit-identical.
    // (AvailableNow may coalesce addData groups, so the batch's true
    // membership is read back from its own segment, not assumed.)
    val segsBefore = DedupIndex.segments(spark, root)
    // started-query segments are epoch-keyed: seg-<epoch>-batch-<id>
    val ep = StreamingDedup.checkpointEpoch(spark, ckpt)
    val segPrefix = s"seg-$ep-batch-"
    val lastBatch = segsBefore.filter(_.startsWith(segPrefix))
      .map(_.stripPrefix(segPrefix).toLong).max
    val lastIds = spark.read
      .parquet(f"$root/$segPrefix%s$lastBatch%010d/sets")
      .select("id").as[Long].collect().toSet
    val lastRows = rows.filter(r => lastIds.contains(r._1))
    val pairsBefore = StreamingDedup.currentPairs(spark, root).count()
    StreamingDedup.dedupBatch(
      lastRows.toSeq.toDF("doc_id", "text"), lastBatch,
      "doc_id", "text", 0.8, root, 30, 6, epoch = Some(ep))
    assert(DedupIndex.segments(spark, root) == segsBefore)
    assert(StreamingDedup.currentPairs(spark, root).count() == pairsBefore)
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)

    // torn-batch replay: a segment that committed WITHOUT its pairs
    // marker (crash between the two) must be rewritten, not doubled
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(f"$root/pairs/$segPrefix%s$lastBatch%010d"))
    StreamingDedup.dedupBatch(
      lastRows.toSeq.toDF("doc_id", "text"), lastBatch,
      "doc_id", "text", 0.8, root, 30, 6, epoch = Some(ep))
    assert(DedupIndex.currentSets(spark, root).count() == rows.length,
      "replay after a torn pairs write must not duplicate index rows")
    assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk,
      "verdict log must converge after torn-batch replay")

    // pairs-log compaction: one merged dir, verdicts identical, and
    // a second compaction has nothing to merge
    val rowsBefore = StreamingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet
    assert(StreamingDedup.compactPairs(spark, root).nonEmpty)
    assert(StreamingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet == rowsBefore,
      "compaction must not change the verdict log's content")
    assert(StreamingDedup.compactPairs(spark, root).isEmpty,
      "a single-dir log has nothing to compact")
    // a batch replayed AFTER its pairs dir was compacted away must be
    // recognized as committed via the compact dir's _sources shadow —
    // re-running it would delete the still-present index segment and
    // re-emit verdicts the compact dir already holds
    val segsAfterCompact = DedupIndex.segments(spark, root)
    StreamingDedup.dedupBatch(
      lastRows.toSeq.toDF("doc_id", "text"), lastBatch,
      "doc_id", "text", 0.8, root, 30, 6, epoch = Some(ep))
    assert(DedupIndex.segments(spark, root) == segsAfterCompact,
      "replay of a compacted-away batch must not touch the index")
    assert(StreamingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet == rowsBefore,
      "replay of a compacted-away batch must not duplicate verdicts")
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)
    // crashed cleanup: a shadowed relic dir is invisible, vacuumable
    val pairsP = new org.apache.hadoop.fs.Path(root, "pairs")
    val fsP = pairsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val compacted = fsP.listStatus(pairsP).map(_.getPath.getName)
      .filter(_.startsWith("compact-")).head
    val relic = "seg-batch-0000000000"
    StreamingDedup.currentPairs(spark, root).limit(2)
      .write.parquet(new org.apache.hadoop.fs.Path(pairsP, relic).toString)
    fsP.create(new org.apache.hadoop.fs.Path(pairsP, s"$relic/_COMMITTED"),
      true).close()
    val cur2 = {
      val in = fsP.open(new org.apache.hadoop.fs.Path(pairsP,
        s"$compacted/_sources"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out2 = fsP.create(new org.apache.hadoop.fs.Path(pairsP,
      s"$compacted/_sources"), true)
    try out2.write(s"$cur2\n$relic".getBytes("UTF-8")) finally out2.close()
    assert(StreamingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet == rowsBefore,
      "shadowed relic must stay invisible")
    assert(StreamingDedup.vacuumPairs(spark, root).contains(relic))
    assert(StreamingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet == rowsBefore)
  }

  test("an epoched batch colliding with legacy pre-epoch state fails " +
      "loudly unless acceptLegacySegments is asserted (r9 ADVICE)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val half = rows.length / 2
    val base = "/tmp/graft-test-streamdedup-legacy"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    // a pre-epoch incarnation committed batch 0 under the legacy name
    StreamingDedup.dedupBatch(rows.take(half).toSeq.toDF("doc_id", "text"),
      0, "doc_id", "text", 0.8, root, 30, 6, epoch = None)
    val before = DedupIndex.currentSets(spark, root).count()
    // a RESET checkpoint's fresh batch 0 (different docs!) collides
    // with the legacy name — silently adopting it would swallow the
    // batch as an already-committed replay. Without the conf: loud.
    val newDocs = rows.drop(half).toSeq.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.dedupBatch(newDocs, 0, "doc_id", "text", 0.8,
        root, 30, 6, epoch = Some("cafe0001"))
    }
    assert(e.getMessage.contains("acceptLegacySegments"))
    assert(DedupIndex.currentSets(spark, root).count() == before,
      "the refused batch must not have touched the store")
    // a KEPT pre-epoch checkpoint (operator asserts it): the replayed
    // batch 0 adopts the legacy name — recognized as committed, store
    // unchanged, nothing doubled
    spark.conf.set("graft.dedup.acceptLegacySegments", "true")
    try {
      StreamingDedup.dedupBatch(
        rows.take(half).toSeq.toDF("doc_id", "text"), 0,
        "doc_id", "text", 0.8, root, 30, 6, epoch = Some("cafe0001"))
      assert(DedupIndex.currentSets(spark, root).count() == before,
        "an adopted committed legacy batch is a no-op replay")
    } finally spark.conf.unset("graft.dedup.acceptLegacySegments")
    // a NON-colliding epoched batch id needs no conf at all
    StreamingDedup.dedupBatch(newDocs, 1, "doc_id", "text", 0.8,
      root, 30, 6, epoch = Some("cafe0001"))
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)
  }

  test("index compaction refuses replay-pending batch segments: " +
      "crash a batch, compact, replay still converges") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val third = rows.length / 3
    val base = "/tmp/graft-test-streamdedup-guard"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    def deliver(id: Long, rs: Seq[(Long, String)]): Unit =
      StreamingDedup.dedupBatch(rs.toDF("doc_id", "text"), id,
        "doc_id", "text", 0.8, root, 30, 6)
    deliver(0, rows.take(third).toSeq)
    deliver(1, rows.slice(third, 2 * third).toSeq)
    deliver(2, rows.drop(2 * third).toSeq)
    // crash batch 2 between its index commit and its pairs commit:
    // the index segment exists, the verdicts do not — recovery WILL
    // replay this batch and expects to delete + rewrite its segment
    val torn = "seg-batch-0000000002"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$root/pairs/$torn"))
    // compaction in the crash-recovery window: must fold ONLY the
    // two committed batches and leave the replay-pending one alone
    val compacted = DedupIndex.compactSegments(spark, root)
    assert(compacted.nonEmpty)
    val segsAfter = DedupIndex.segments(spark, root)
    assert(segsAfter.contains(torn),
      s"replay-pending segment must survive compaction: $segsAfter")
    assert(segsAfter.size == 2, s"two committed folded into one: $segsAfter")
    // recovery replays batch 2 — the rewrite must land exactly once
    deliver(2, rows.drop(2 * third).toSeq)
    assert(DedupIndex.currentSets(spark, root).count() == rows.length,
      "replay after guarded compaction must not lose or double docs")
    val bulk = pairSet(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
    assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk,
      "verdict log must converge after guarded compaction + replay")
    // with the batch committed, the next compaction may fold it
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    assert(DedupIndex.segments(spark, root).size == 1)
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)
  }

  test("the VERY FIRST streaming batch torn before any pairs write " +
      "is replay-pending — no pairs log is not a free pass (r8 review)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val half = rows.length / 2
    val base = "/tmp/graft-test-streamdedup-firsttorn"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    // a bulk-loaded store (two committed NON-batch segments), no
    // pairs log — StreamingDedup has never successfully finished a
    // batch here
    DedupIndex.update(spark, root, rows.take(half).toSeq.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.8)
    DedupIndex.update(spark, root,
      rows.slice(half, half + half / 2).toSeq.toDF("doc_id", "text"),
      "doc_id", "text", threshold = 0.8)
    // first streaming batch crashes between its segment _SUCCESS and
    // its first pairs write: root/pairs never came to exist
    val tail = rows.drop(half + half / 2).toSeq
    StreamingDedup.dedupBatch(tail.toDF("doc_id", "text"), 0,
      "doc_id", "text", 0.8, root, 30, 6)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$root/pairs"))
    // compaction in that window must fold ONLY the bulk segments —
    // the pre-fix `!fs.exists(pairsBase) => Set.empty` folded the
    // torn batch segment away, and its replay's left-anti then
    // dropped the whole batch's verdicts forever
    val torn = "seg-batch-0000000000"
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    val segs = DedupIndex.segments(spark, root)
    assert(segs.contains(torn),
      s"first-batch torn segment must survive compaction: $segs")
    // recovery replays batch 0 and the verdicts land
    StreamingDedup.dedupBatch(tail.toDF("doc_id", "text"), 0,
      "doc_id", "text", 0.8, root, 30, 6)
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)
    assert(pairSet(StreamingDedup.currentPairs(spark, root)).nonEmpty,
      "the replayed first batch's verdicts must exist")
  }

  test("auto-compaction: a long stream keeps segment and pairs-dir " +
      "counts bounded on its own, detection unchanged (r9)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val base = "/tmp/graft-test-streamdedup-autocompact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"; val ckpt = s"$base/ckpt"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    spark.conf.set("graft.dedup.autoCompactSegments", "3")
    try {
      // eight separate drains => eight micro-batches, each committing
      // a segment + a pairs dir; the trigger must keep both logs at
      // <= threshold+1 dirs without any manual janitorial call
      val n = rows.length / 8
      for (k <- 0 until 8) {
        val slice = if (k == 7) rows.drop(7 * n) else rows.slice(k * n, (k + 1) * n)
        mem.addData(slice.toSeq)
        val q = StreamingDedup.start(stream, "doc_id", "text",
          threshold = 0.8, root, ckpt, availableNow = true)
        q.awaitTermination()
      }
      val segs = DedupIndex.segments(spark, root)
      assert(segs.size <= 4,
        s"auto-compaction should bound the index log, got $segs")
      val pairsP = new org.apache.hadoop.fs.Path(root, "pairs")
      val fsP = pairsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val pairDirs = fsP.listStatus(pairsP).filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(d => fsP.exists(new org.apache.hadoop.fs.Path(pairsP,
          s"$d/_COMMITTED")))
      assert(pairDirs.length <= 4,
        s"auto-compaction should bound the pairs log, got ${pairDirs.toSeq}")
      // and the maintenance never cost a verdict or a document
      assert(DedupIndex.currentSets(spark, root).count() == rows.length)
      val bulk = pairSet(
        Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
      assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk,
        "auto-compacted stream must still equal the bulk verdicts")
    } finally spark.conf.unset("graft.dedup.autoCompactSegments")
  }

  test("pairs closure prunes a batch name once its index segment is " +
      "compacted away — bounded _sources, replay still converges (r9)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val fifth = rows.length / 5
    val base = "/tmp/graft-test-streamdedup-closureprune"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    def deliver(id: Long, rs: Seq[(Long, String)]): Unit =
      StreamingDedup.dedupBatch(rs.toDF("doc_id", "text"), id,
        "doc_id", "text", 0.8, root, 30, 6)
    deliver(0, rows.take(fifth).toSeq)
    deliver(1, rows.slice(fifth, 2 * fifth).toSeq)
    deliver(2, rows.slice(2 * fifth, 3 * fifth).toSeq)
    assert(StreamingDedup.compactPairs(spark, root).nonEmpty)
    // index compaction folds batches 0-2 (their pairs are committed
    // via the compact target's shadow) — their index dirs are gone
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    deliver(3, rows.slice(3 * fifth, 4 * fifth).toSeq)
    deliver(4, rows.drop(4 * fifth).toSeq)
    // pairs compaction #2: batches 0-2's names are prunable (no live
    // index segment needs them), batches 3-4's dirs are direct srcs
    assert(StreamingDedup.compactPairs(spark, root).nonEmpty)
    val pairsP = new org.apache.hadoop.fs.Path(root, "pairs")
    val fsP = pairsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = fsP.listStatus(pairsP).map(_.getPath.getName)
      .filter(_.startsWith("compact-"))
      .filter(d => fsP.exists(new org.apache.hadoop.fs.Path(pairsP,
        s"$d/_COMMITTED"))).max // the newest target
    val sources = graft.sources.ShadowLog.readSources(fsP, pairsP, target)
    for (old <- Seq("seg-batch-0000000000", "seg-batch-0000000001",
        "seg-batch-0000000002"))
      assert(!sources.contains(old),
        s"closure must prune $old after its index segment folded: $sources")
    // liveness: batches 3-4's index segments must still fold
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    assert(DedupIndex.segments(spark, root).size == 1,
      "live batch segments must not be stranded pending")
    // a (hypothetical) replay of a pruned batch converges: nothing
    // lost, nothing doubled — the compacted copies already hold it
    val bulk = pairSet(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
    deliver(1, rows.slice(fifth, 2 * fifth).toSeq)
    assert(DedupIndex.currentSets(spark, root).count() == rows.length,
      "pruned-name replay must not double-index")
    assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk,
      "pruned-name replay must not change the verdicts")
  }

  test("index compaction stays live through DOUBLE pairs compaction: " +
      "folded batch names are retained, not pruned (r8 review)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val fifth = rows.length / 5
    val base = "/tmp/graft-test-streamdedup-doublecompact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    def deliver(id: Long, rs: Seq[(Long, String)]): Unit =
      StreamingDedup.dedupBatch(rs.toDF("doc_id", "text"), id,
        "doc_id", "text", 0.8, root, 30, 6)
    deliver(0, rows.take(fifth).toSeq)
    deliver(1, rows.slice(fifth, 2 * fifth).toSeq)
    deliver(2, rows.slice(2 * fifth, 3 * fifth).toSeq)
    // pairs compaction #1 folds batches 0-2 and deletes their dirs
    assert(StreamingDedup.compactPairs(spark, root).nonEmpty)
    deliver(3, rows.slice(3 * fifth, 4 * fifth).toSeq)
    deliver(4, rows.drop(4 * fifth).toSeq)
    // pairs compaction #2 deletes compaction #1's target — the only
    // dir whose _sources named batches 0-2. The retained closure must
    // keep carrying those names even though their dirs are long gone;
    // pre-fix pruning dropped them, and compactSegments then
    // classified batches 0-2's index segments replay-pending forever
    assert(StreamingDedup.compactPairs(spark, root).nonEmpty)
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    assert(DedupIndex.segments(spark, root).size == 1,
      "ALL five committed batch segments must fold — none stuck pending")
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)
    val bulk = pairSet(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
    assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk,
      "verdict log unchanged through double compaction")
  }

  test("retract covers the VERDICT log: a retracted id's pairs vanish " +
      "immediately in the tombstone-only crash window, are PHYSICALLY " +
      "purged by retract, other verdicts survive row-identical, the " +
      "purged batch replays as a no-op, and merges apply live " +
      "tombstones (r10)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val third = rows.length / 3
    val base = "/tmp/graft-test-streamretract"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    val ep = "retractep"
    val batches = Seq(rows.take(third), rows.slice(third, 2 * third),
      rows.drop(2 * third))
    def deliver(id: Long): Unit =
      StreamingDedup.dedupBatch(batches(id.toInt).toSeq
        .toDF("doc_id", "text"), id, "doc_id", "text", 0.8, root, 30, 6,
        epoch = Some(ep))
    (0L to 2L).foreach(deliver)
    // the raw PHYSICAL log, bypassing the reader's tombstone filter
    // (underscore-prefixed protocol files are ignored by the reader)
    def rawPairs() = spark.read.parquet(s"$root/pairs/*")
      .select("a", "b", "j", "batch_id").collect().map(_.toSeq).toSet
    def visible() = StreamingDedup.currentPairs(spark, root)
      .select("a", "b", "j", "batch_id").collect().map(_.toSeq).toSet
    val before = visible()
    assert(before.nonEmpty, "fixture must produce verdicts")

    // merges APPLY live tombstones: a victim retracted at the index
    // level only (no purge) is dropped physically by the next pairs
    // compaction, while its tombstone is still live
    val victim2 = StreamingDedup.currentPairs(spark, root)
      .head.getAs[Long]("a")
    val expected2 = before.filterNot(s =>
      s.head == victim2 || s(1) == victim2)
    assert(expected2.size < before.size)
    assert(DedupIndex.tombstone(spark, root,
      Seq(victim2).toDF("doc_id")).nonEmpty)
    assert(StreamingDedup.compactPairs(spark, root).nonEmpty)
    assert(rawPairs() == expected2,
      "a pairs merge must apply live tombstones physically")

    // CRASH WINDOW: the tombstone landed but the purge never ran (a
    // retract that died between its halves, or a direct index-level
    // tombstone on a streaming store). The reader must hide the
    // verdicts although the log still physically holds them.
    val victimRow = StreamingDedup.currentPairs(spark, root).head
    val victim = victimRow.getAs[Long]("a")
    val victimBatch = victimRow.getAs[Long]("batch_id")
    assert(victim != victim2)
    val expected = expected2.filterNot(s =>
      s.head == victim || s(1) == victim)
    assert(expected.size < expected2.size)
    assert(DedupIndex.tombstone(spark, root,
      Seq(victim).toDF("doc_id")).nonEmpty)
    assert(visible() == expected,
      "live tombstone must hide the id's verdicts from readers")
    assert(rawPairs() == expected2,
      "the crash window leaves the rows physically present")

    // rerunning the retract completes the purge (idempotent halves)
    assert(StreamingDedup.retract(spark, root,
      Seq(victim).toDF("doc_id")).nonEmpty)
    assert(rawPairs() == expected,
      "retract must PHYSICALLY purge the id's verdicts and keep " +
        "every other row byte-identical")
    assert(visible() == expected)

    // the batch's pairs dir is long merged away; its name rides the
    // shadow closure, so a replay must be a committed no-op
    val segsBefore = DedupIndex.segments(spark, root)
    deliver(victimBatch)
    assert(DedupIndex.segments(spark, root) == segsBefore,
      "replay of a purged batch must not touch the index")
    assert(rawPairs() == expected,
      "replay of a purged batch must not resurrect or duplicate")

    // a covering index compaction drains the tombstones; the verdicts
    // stay clean because they were removed physically, not filtered
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    assert(DedupIndex.tombSegments(spark, root).isEmpty,
      "covering compaction must drain the applied tombstones")
    assert(visible() == expected)
    assert(DedupIndex.currentSets(spark, root)
      .filter(col("id").isin(victim, victim2)).isEmpty,
      "retracted docs must be physically out of the index too")
  }
}
