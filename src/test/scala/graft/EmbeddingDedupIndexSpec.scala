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
}
