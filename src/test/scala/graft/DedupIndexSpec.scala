package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.DedupIndex

/** Incremental dedup index: batch-at-a-time detection over the
  * segment store equals the bulk pipeline over the whole corpus,
  * commits are crash-safe, and geometry is pinned. */
class DedupIndexSpec extends AnyFunSuite with SparkFixture {

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("three incremental batches find exactly the bulk pipeline's pairs") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = Files.createTempDirectory("dedup-index").toString
    // three disjoint id-range batches — near-dup pairs in this corpus
    // exist both inside and across these ranges (the sf0.001 corpus
    // plants ~12% near-dups at random id distance)
    val batches = Seq(
      docs.filter(col("doc_id") < 50),
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 110),
      docs.filter(col("doc_id") >= 110))
    val found = batches.flatMap { b =>
      val r = DedupIndex.update(spark, root, b, "doc_id", "text",
        threshold = 0.8)
      pairSet(r.pairs)
    }.toSet
    val bulk = pairSet(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
    assert(bulk.nonEmpty, "corpus must contain near-dups for this test")
    assert(found == bulk,
      s"incremental != bulk: missing=${(bulk -- found).take(5)} " +
        s"extra=${(found -- bulk).take(5)}")
    // three committed segments, each O(batch): store rows == corpus docs
    assert(DedupIndex.segments(spark, root).size == 3)
    assert(DedupIndex.currentSets(spark, root).count() == docs.count())
  }

  test("uncommitted segment (no _SUCCESS) is invisible to readers") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").filter(col("doc_id") < 30)
    val root = Files.createTempDirectory("dedup-index-crash").toString
    DedupIndex.update(spark, root, docs, "doc_id", "text", threshold = 0.8)
    val committed = DedupIndex.currentSets(spark, root).count()
    // simulate a crash mid-write: parquet lands, marker never does
    val orphan = s"$root/seg-9999999999999-0001"
    DedupIndex.currentSets(spark, root).write.parquet(s"$orphan/sets")
    DedupIndex.currentBands(spark, root).write.parquet(s"$orphan/bands")
    assert(DedupIndex.segments(spark, root).size == 1)
    assert(DedupIndex.currentSets(spark, root).count() == committed)
  }

  test("geometry mismatch fails loudly instead of degrading recall") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").filter(col("doc_id") < 30)
    val root = Files.createTempDirectory("dedup-index-meta").toString
    DedupIndex.update(spark, root, docs, "doc_id", "text",
      threshold = 0.8, numHashes = 30, bands = 6)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.update(spark, root, docs, "doc_id", "text",
        threshold = 0.8, numHashes = 20, bands = 5)
    }
    assert(e.getMessage.contains("must match"))
  }
}
