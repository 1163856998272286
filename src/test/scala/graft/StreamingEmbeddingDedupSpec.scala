package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Knn
import graft.sources.EmbeddingDedupIndex
import graft.streaming.StreamingEmbeddingDedup

/** The vector twin of StreamingDedupSpec: embedding-dedup-on-arrival
  * through the streaming surface equals the bulk banded pipeline,
  * replays converge, restarts resume, a reband in progress fails the
  * stream loudly, and auto-compaction bounds the logs. */
class StreamingEmbeddingDedupSpec extends AnyFunSuite with SparkFixture {

  private val dim = 64

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Clustered fixture (the EmbeddingDedupIndexSpec recipe): 150
    * bases + a near-copy of every third one, so pairs exist inside
    * and across the arrival batches. */
  private lazy val corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val bases = Seq.tabulate(150)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = bases.zipWithIndex.collect { case ((id, v), i) if i % 3 == 0 =>
      (1000L + id, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    (bases ++ dups).toDF("vec_id", "embedding").localCheckpoint()
  }

  test("streamed vector batches find exactly the bulk pipeline's " +
      "pairs; committed and torn replays are exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    val third = rows.length / 3
    val base = "/tmp/graft-test-streamedembed"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"; val ckpt = s"$base/ckpt"
    val th = 0.9

    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF.toDF("vec_id", "embedding")
    def drain(): Unit = {
      val q = StreamingEmbeddingDedup.start(stream, "vec_id", "embedding",
        dim, th, root, ckpt, availableNow = true)
      q.awaitTermination()
    }
    // three arrivals across two query runs: the second run must
    // resume from the checkpoint, not reprocess
    mem.addData(rows.take(third).toSeq)
    drain()
    mem.addData(rows.slice(third, 2 * third).toSeq)
    mem.addData(rows.drop(2 * third).toSeq)
    drain()

    val found = pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
    val bulk = pairSet(Knn.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim, th))
    assert(bulk.nonEmpty, "fixture must contain near-dup pairs")
    assert(found == bulk,
      s"streamed != bulk: missing=${(bulk -- found).take(5)} " +
        s"extra=${(found -- bulk).take(5)}")
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length)

    // committed replay: re-deliver the last batch by hand — markers
    // short-circuit, nothing doubles
    val ep = graft.streaming.StreamingDedup.checkpointEpoch(spark, ckpt)
    val segPrefix = s"seg-$ep-batch-"
    val segsBefore = EmbeddingDedupIndex.segments(spark, root)
    val lastBatch = segsBefore.filter(_.startsWith(segPrefix))
      .map(_.stripPrefix(segPrefix).toLong).max
    val lastIds = spark.read
      .parquet(f"$root/$segPrefix%s$lastBatch%010d/vecs")
      .select("id").as[Long].collect().toSet
    val lastRows = rows.filter(r => lastIds.contains(r._1))
    val pairsBefore = StreamingEmbeddingDedup.currentPairs(spark, root)
      .count()
    StreamingEmbeddingDedup.dedupBatch(
      lastRows.toSeq.toDF("vec_id", "embedding"), lastBatch,
      "vec_id", "embedding", dim, th, root, 10, 6, 500, epoch = Some(ep))
    assert(EmbeddingDedupIndex.segments(spark, root) == segsBefore)
    assert(StreamingEmbeddingDedup.currentPairs(spark, root).count()
      == pairsBefore)

    // torn replay: segment committed, pairs dir lost (crash between
    // the two) — the replay rewrites the segment, verdicts converge
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(f"$root/pairs/$segPrefix%s$lastBatch%010d"))
    StreamingEmbeddingDedup.dedupBatch(
      lastRows.toSeq.toDF("vec_id", "embedding"), lastBatch,
      "vec_id", "embedding", dim, th, root, 10, 6, 500, epoch = Some(ep))
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length,
      "torn-batch replay must not duplicate index rows")
    assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
      == bulk, "verdict log must converge after torn-batch replay")

    // pairs compaction preserves verdicts; a batch replayed after its
    // pairs dir was compacted away is recognized via the shadow
    val rowsBefore = StreamingEmbeddingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet
    assert(StreamingEmbeddingDedup.compactPairs(spark, root).nonEmpty)
    assert(StreamingEmbeddingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet == rowsBefore)
    val segsAfterCompact = EmbeddingDedupIndex.segments(spark, root)
    StreamingEmbeddingDedup.dedupBatch(
      lastRows.toSeq.toDF("vec_id", "embedding"), lastBatch,
      "vec_id", "embedding", dim, th, root, 10, 6, 500, epoch = Some(ep))
    assert(EmbeddingDedupIndex.segments(spark, root) == segsAfterCompact,
      "replay of a compacted-away batch must not touch the index")
    assert(StreamingEmbeddingDedup.currentPairs(spark, root)
      .collect().map(_.toSeq).toSet == rowsBefore)
  }

  test("index compaction refuses replay-pending embedding batch " +
      "segments; replay after guarded compaction converges") {
    import spark.implicits._
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    val third = rows.length / 3
    val base = "/tmp/graft-test-streamedembed-guard"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    val th = 0.9
    def deliver(id: Long, rs: Seq[(Long, Array[Float])]): Unit =
      StreamingEmbeddingDedup.dedupBatch(rs.toDF("vec_id", "embedding"),
        id, "vec_id", "embedding", dim, th, root, 10, 6, 500)
    deliver(0, rows.take(third).toSeq)
    deliver(1, rows.slice(third, 2 * third).toSeq)
    deliver(2, rows.drop(2 * third).toSeq)
    // crash batch 2 between its index commit and its pairs commit
    val torn = "seg-batch-0000000002"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$root/pairs/$torn"))
    assert(EmbeddingDedupIndex.compactSegments(spark, root).nonEmpty)
    val segsAfter = EmbeddingDedupIndex.segments(spark, root)
    assert(segsAfter.contains(torn),
      s"replay-pending segment must survive compaction: $segsAfter")
    assert(segsAfter.size == 2, s"two committed fold into one: $segsAfter")
    // recovery replays batch 2 — exactly once
    deliver(2, rows.drop(2 * third).toSeq)
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length)
    val bulk = pairSet(Knn.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim, th))
    assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
      == bulk)
    // with the batch committed, the next compaction folds everything
    assert(EmbeddingDedupIndex.compactSegments(spark, root).nonEmpty)
    assert(EmbeddingDedupIndex.segments(spark, root).size == 1)
  }

  test("reband refuses while a streaming batch is replay-pending — " +
      "folding it away would silently drop the batch (r10)") {
    import spark.implicits._
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    val half = rows.length / 2
    val base = "/tmp/graft-test-streamedembed-rebandguard"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    val th = 0.9
    def deliver(id: Long, rs: Seq[(Long, Array[Float])]): Unit =
      StreamingEmbeddingDedup.dedupBatch(rs.toDF("vec_id", "embedding"),
        id, "vec_id", "embedding", dim, th, root, 10, 6, 500)
    deliver(0, rows.take(half).toSeq)
    deliver(1, rows.drop(half).toSeq)
    // crash batch 1 between its segment commit and its pairs commit
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$root/pairs/seg-batch-0000000001"))
    val e = intercept[IllegalArgumentException] {
      EmbeddingDedupIndex.reband(spark, root, bands = 10, bits = 7,
        maxBucket = 500)
    }
    assert(e.getMessage.contains("replay-pending"))
    // the refusal must leave no intent behind — the store stays
    // updatable so the stream's recovery can actually run
    deliver(1, rows.drop(half).toSeq)
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length)
    // with the batch committed, the migration proceeds
    EmbeddingDedupIndex.reband(spark, root, bands = 10, bits = 7,
      maxBucket = 500)
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length)
  }

  test("a pending reband fails the stream loudly; after the reband " +
      "converges the stream resumes and detects") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    val half = rows.length / 2
    val base = "/tmp/graft-test-streamedembed-reband"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"; val ckpt = s"$base/ckpt"
    val th = 0.9
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF.toDF("vec_id", "embedding")
    def drain(): Unit = {
      val q = StreamingEmbeddingDedup.start(stream, "vec_id", "embedding",
        dim, th, root, ckpt, availableNow = true)
      q.awaitTermination()
    }
    mem.addData(rows.take(half).toSeq)
    drain()
    // a reband crashed mid-flight: its intent marker is pending
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, "_reband"), true)
      .close()
    mem.addData(rows.drop(half).toSeq)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    assert(e.getMessage.contains("reband"),
      s"stream must surface the reband refusal: ${e.getMessage}")
    // the torn batch must not have committed anything visible
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count() == half)
    // operator converges the store (here: the intent was a crash
    // relic before any write — reband to the same geometry clears it)
    fs.delete(new org.apache.hadoop.fs.Path(root, "_reband"), false)
    // the stream restart replays the failed batch and converges
    drain()
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length)
    val bulk = pairSet(Knn.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim, th))
    assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
      == bulk)
  }

  test("auto-compaction bounds both logs on a long vector stream; " +
      "detection unchanged") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    val base = "/tmp/graft-test-streamedembed-autocompact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"; val ckpt = s"$base/ckpt"
    val th = 0.9
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = mem.toDF.toDF("vec_id", "embedding")
    spark.conf.set("graft.dedup.autoCompactSegments", "3")
    try {
      val n = rows.length / 8
      for (k <- 0 until 8) {
        val slice = if (k == 7) rows.drop(7 * n)
          else rows.slice(k * n, (k + 1) * n)
        mem.addData(slice.toSeq)
        val q = StreamingEmbeddingDedup.start(stream, "vec_id",
          "embedding", dim, th, root, ckpt, availableNow = true)
        q.awaitTermination()
      }
      val segs = EmbeddingDedupIndex.segments(spark, root)
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
      assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
        == rows.length)
      val bulk = pairSet(Knn.nearDupPairsLsh(corpus, "vec_id",
        "embedding", dim, th))
      assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
        == bulk,
        "auto-compacted vector stream must still equal the bulk verdicts")
    } finally spark.conf.unset("graft.dedup.autoCompactSegments")
  }

  test("file-source vector stream: resume processes only new files; " +
      "fresh-checkpoint redelivery and reset-over-kept-store converge") {
    import spark.implicits._
    val base = "/tmp/graft-test-streamedembed-file"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val in = s"$base/in"; val root = s"$base/index"
    val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val th = 0.9
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    def json(r: (Long, Array[Float])) =
      s"""{"vec_id": ${r._1}, "embedding": [${r._2.mkString(",")}]}"""
    def drop(name: String, rs: Seq[(Long, Array[Float])]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("graft-sembed", ".json")
      java.nio.file.Files.writeString(tmp,
        rs.map(json).mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(in, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def run(checkpoint: String): Unit = {
      val stream = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>").json(in)
      val q = StreamingEmbeddingDedup.start(stream, "vec_id", "embedding",
        dim, th, root, checkpoint, availableNow = true)
      q.awaitTermination()
    }
    val third = rows.length / 3
    // cycle 1
    drop("f1.json", rows.take(third).toSeq)
    run(ckpt)
    val segsAfter1 = EmbeddingDedupIndex.segments(spark, root)
    assert(segsAfter1.nonEmpty)
    // cycle 2: nothing new — store untouched
    run(ckpt)
    assert(EmbeddingDedupIndex.segments(spark, root) == segsAfter1,
      "an empty restart must not add segments or rewrite old ones")
    // cycle 3: the rest folds in against the prior store
    drop("f2.json", rows.slice(third, 2 * third).toSeq)
    drop("f3.json", rows.drop(2 * third).toSeq)
    run(ckpt)
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length)
    val bulk = pairSet(Knn.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim, th))
    assert(bulk.nonEmpty)
    assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
      == bulk)
    // full redelivery under a FRESH checkpoint: batch ids restart but
    // the fresh epoch keys fresh segments; first-wins drops the
    // already-indexed ids; verdict SET unchanged
    run(s"$base/ckpt2")
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length,
      "fresh-checkpoint redelivery must not duplicate the store")
    assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
      == bulk)
    // reset over a kept store: a NEW vector whose batch id collides
    // with a previously committed one must be indexed (epoch key)
    val newId = 5000L
    drop("f4.json", Seq((newId, rows.head._2)))
    run(s"$base/ckpt3")
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == rows.length + 1,
      "a new vector after checkpoint reset must be indexed")
    assert(pairSet(StreamingEmbeddingDedup.currentPairs(spark, root))
      .contains((rows.head._1, newId)),
      "the new vector's near-dup pair against the old store must surface")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("retract covers the vector verdict log: crash-window hiding, " +
      "physical purge, surviving rows identical, re-arrival dropped " +
      "while live (r10)") {
    import spark.implicits._
    val rows = corpus.as[(Long, Array[Float])].collect().sortBy(_._1)
    val half = rows.length / 2
    val base = "/tmp/graft-test-streamedembed-retract"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val root = s"$base/index"
    val th = 0.9
    val ep = "eretract"
    def deliver(id: Long, rs: Seq[(Long, Array[Float])]): Unit =
      StreamingEmbeddingDedup.dedupBatch(rs.toDF("vec_id", "embedding"),
        id, "vec_id", "embedding", dim, th, root, 10, 6, 500,
        epoch = Some(ep))
    deliver(0, rows.take(half).toSeq)
    deliver(1, rows.drop(half).toSeq)
    def rawPairs() = spark.read.parquet(s"$root/pairs/*")
      .select("a", "b", "sim", "batch_id").collect().map(_.toSeq).toSet
    def visible() = StreamingEmbeddingDedup.currentPairs(spark, root)
      .select("a", "b", "sim", "batch_id").collect().map(_.toSeq).toSet
    val before = visible()
    assert(before.nonEmpty, "fixture must produce verdicts")
    val victim = StreamingEmbeddingDedup.currentPairs(spark, root)
      .head.getAs[Long]("a")
    val expected = before.filterNot(s =>
      s.head == victim || s(1) == victim)
    assert(expected.size < before.size)

    // crash window: index tombstone without the purge — hidden from
    // the reader, physically still present
    assert(EmbeddingDedupIndex.tombstone(spark, root,
      Seq(victim).toDF("vec_id")).nonEmpty)
    assert(visible() == expected,
      "live tombstone must hide the vector's verdicts")
    assert(rawPairs() == before)

    // a re-arrival of the retracted vector while the tombstone is
    // live is dropped AND produces no verdicts
    val vvec = rows.find(_._1 == victim).get._2
    deliver(2, Seq((victim, vvec)))
    assert(EmbeddingDedupIndex.currentVecs(spark, root)
      .filter(col("id") === victim).isEmpty,
      "a live-tombstoned vector must not be re-indexed")
    assert(visible() == expected)

    // the completed retract purges physically; survivors identical
    assert(StreamingEmbeddingDedup.retract(spark, root,
      Seq(victim).toDF("vec_id")).nonEmpty)
    assert(rawPairs() == expected,
      "retract must physically purge the vector's verdicts")
    assert(visible() == expected)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
