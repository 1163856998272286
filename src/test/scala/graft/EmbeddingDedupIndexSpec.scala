package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Knn
import graft.sources.EmbeddingDedupIndex

/** The embedding-side incremental near-dup index: batch-at-a-time
  * detection over the segment store equals the bulk banded pipeline,
  * replays converge, and geometry is pinned. */
class EmbeddingDedupIndexSpec extends AnyFunSuite with SparkFixture {

  private val dim = 64

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val corpus = {
    import spark.implicits._
    // clustered fixture (the AnnSpec recipe): 150 bases + a near-copy
    // of every third one (cosine ≈ 0.95+) so near-dup pairs exist
    // both inside and across the ingest batches below
    val rnd = new scala.util.Random(42)
    val bases = Seq.tabulate(150)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = bases.zipWithIndex.collect { case ((id, v), i) if i % 3 == 0 =>
      (1000L + id, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    (bases ++ dups).toDF("vec_id", "embedding").localCheckpoint()
  }

  test("incremental batches find exactly the bulk banded pipeline's " +
      "pairs; re-ingest is first-wins; replay converges") {
    val root = Files.createTempDirectory("emb-dedup-index").toString
    val th = 0.9
    // batches split so planted (base, 1000+base) pairs straddle them
    val batches = Seq(
      corpus.filter(col("vec_id") < 75),
      corpus.filter(col("vec_id") >= 75 && col("vec_id") < 1050),
      corpus.filter(col("vec_id") >= 1050))
    val found = batches.flatMap { b =>
      pairSet(EmbeddingDedupIndex.update(spark, root, b,
        "vec_id", "embedding", dim, th).pairs)
    }.toSet
    val bulk = pairSet(Knn.nearDupPairsLsh(corpus, "vec_id", "embedding",
      dim, th))
    assert(bulk.nonEmpty, "fixture must contain near-dup pairs")
    assert(found == bulk,
      s"incremental != bulk: missing=${(bulk -- found).take(5)} " +
        s"extra=${(found -- bulk).take(5)}")
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == corpus.count())

    // re-ingesting an overlapping batch adds nothing and emits no
    // self-pairs
    val res = EmbeddingDedupIndex.update(spark, root,
      corpus.filter(col("vec_id") < 75), "vec_id", "embedding", dim, th)
    assert(res.pairs.count() == 0)
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == corpus.count())

    // named-segment replay (the streaming crash-recovery unit)
    // rewrites, never doubles — replay batch 3 onto ITS OWN segment
    // (segments sort by commit time, so index 2 is batch 3's)
    val segs = EmbeddingDedupIndex.segments(spark, root)
    EmbeddingDedupIndex.update(spark, root,
      corpus.filter(col("vec_id") >= 1050), "vec_id", "embedding", dim,
      th, segmentName = Some(segs(2)))
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == corpus.count())

    // geometry mismatch fails loudly
    val e = intercept[IllegalArgumentException] {
      EmbeddingDedupIndex.update(spark, root, corpus,
        "vec_id", "embedding", dim, threshold = 0.8)
    }
    assert(e.getMessage.contains("must match"))
  }

  test("segment compaction: content identical, fewer segments, " +
      "detection unchanged; refused while a reband is pending (r9)") {
    val root = Files.createTempDirectory("emb-dedup-compact").toString
    val th = 0.9
    // a streaming-shaped store: several small update segments
    for (k <- 0 until 4)
      EmbeddingDedupIndex.update(spark, root,
        corpus.filter(pmod(col("vec_id"), lit(4)) === k),
        "vec_id", "embedding", dim, th, bits = 5)
    val vecsBefore = EmbeddingDedupIndex.currentVecs(spark, root)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(EmbeddingDedupIndex.segments(spark, root).size == 4)
    val seg = EmbeddingDedupIndex.compactSegments(spark, root)
    assert(seg.nonEmpty)
    assert(EmbeddingDedupIndex.segments(spark, root) == Seq(seg.get))
    assert(EmbeddingDedupIndex.currentVecs(spark, root)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      == vecsBefore, "compaction must not change the vecs content")
    // detection over the compacted store == over an uncompacted twin
    val twin = Files.createTempDirectory("emb-dedup-twin").toString
    for (k <- 0 until 4)
      EmbeddingDedupIndex.update(spark, twin,
        corpus.filter(pmod(col("vec_id"), lit(4)) === k),
        "vec_id", "embedding", dim, th, bits = 5)
    val probe = corpus.limit(30)
      .withColumn("vec_id", col("vec_id") + 5000L)
    val pc = pairSet(EmbeddingDedupIndex.update(spark, root, probe,
      "vec_id", "embedding", dim, th, bits = 5).pairs)
    val pu = pairSet(EmbeddingDedupIndex.update(spark, twin, probe,
      "vec_id", "embedding", dim, th, bits = 5).pairs)
    assert(pc.nonEmpty && pc == pu,
      "probe batch must find identical pairs on compacted vs raw store")
    // a second compaction folds the probe's segment too
    assert(EmbeddingDedupIndex.compactSegments(spark, root).nonEmpty)
    assert(EmbeddingDedupIndex.segments(spark, root).size == 1)
    // a pending reband intent refuses compaction (the reband owns
    // the store until it converges)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, "_reband"), true).close()
    val e = intercept[IllegalArgumentException] {
      EmbeddingDedupIndex.compactSegments(spark, root)
    }
    assert(e.getMessage.contains("reband"))
  }

  test("reband migrates to a new geometry in place: probe equals a " +
      "fresh index, crash mid-reband refuses updates then converges") {
    val root = Files.createTempDirectory("emb-dedup-reband").toString
    val th = 0.9
    val store = corpus.filter(col("vec_id") =!= 0L)
    val probe = corpus.filter(col("vec_id") === 0L) // near-dups 1000L
    EmbeddingDedupIndex.update(spark, root, store,
      "vec_id", "embedding", dim, th) // creation geometry 10/6/500
    // migrate to a finer layout, as if the corpus outgrew 6 bits
    val seg = EmbeddingDedupIndex.reband(spark, root,
      bands = 12, bits = 8, maxBucket = 300)
    assert(EmbeddingDedupIndex.segments(spark, root) == Seq(seg),
      "one reband segment shadows the whole prior store")
    assert(EmbeddingDedupIndex.currentVecs(spark, root).count()
      == store.count(), "reband must carry every vector over")
    // old geometry now fails loudly; new geometry is the contract
    val e = intercept[IllegalArgumentException] {
      EmbeddingDedupIndex.update(spark, root, probe,
        "vec_id", "embedding", dim, th)
    }
    assert(e.getMessage.contains("must match"))
    // probing the rebanded store == probing a fresh store built at
    // the target geometry (hyperplanes are seed-derived, so equal
    // geometry means equal buckets means equal candidates)
    val fresh = Files.createTempDirectory("emb-dedup-reband-fresh").toString
    EmbeddingDedupIndex.update(spark, fresh, store, "vec_id", "embedding",
      dim, th, bands = 12, bits = 8, maxBucket = 300)
    val gotFresh = pairSet(EmbeddingDedupIndex.update(spark, fresh, probe,
      "vec_id", "embedding", dim, th, bands = 12, bits = 8,
      maxBucket = 300).pairs)
    val gotReband = pairSet(EmbeddingDedupIndex.update(spark, root, probe,
      "vec_id", "embedding", dim, th, bands = 12, bits = 8,
      maxBucket = 300).pairs)
    assert(gotFresh.nonEmpty, "probe must find its planted near-dup")
    assert(gotReband == gotFresh,
      s"rebanded != fresh: missing=${(gotFresh -- gotReband).take(5)} " +
        s"extra=${(gotReband -- gotFresh).take(5)}")

    // crash mid-reband: intent present, segment not yet committed —
    // updates must refuse, a DIFFERENT target must be rejected, and
    // rerunning the SAME reband converges
    val root2 = Files.createTempDirectory("emb-dedup-reband-crash").toString
    EmbeddingDedupIndex.update(spark, root2, store,
      "vec_id", "embedding", dim, th)
    val fs = new org.apache.hadoop.fs.Path(root2).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(root2, "_reband"), false)
    try out.write(
      s"""{"threshold":$th,"bands":12,"bits":8,"maxBucket":300}"""
        .getBytes("UTF-8"))
    finally out.close()
    val eu = intercept[IllegalArgumentException] {
      EmbeddingDedupIndex.update(spark, root2, probe,
        "vec_id", "embedding", dim, th)
    }
    assert(eu.getMessage.contains("reband"))
    val ed = intercept[IllegalArgumentException] {
      EmbeddingDedupIndex.reband(spark, root2, bands = 9, bits = 7,
        maxBucket = 200)
    }
    assert(ed.getMessage.contains("pending"))
    EmbeddingDedupIndex.reband(spark, root2, bands = 12, bits = 8,
      maxBucket = 300)
    val gotRecovered = pairSet(EmbeddingDedupIndex.update(spark, root2,
      probe, "vec_id", "embedding", dim, th, bands = 12, bits = 8,
      maxBucket = 300).pairs)
    assert(gotRecovered == gotFresh,
      "recovered reband must converge to the fresh-index geometry")
  }
}
