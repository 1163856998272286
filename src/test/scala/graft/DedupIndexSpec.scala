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

  test("a within-batch duplicate id is indexed once, no self-pairs") {
    // at-least-once sources can redeliver INSIDE one micro-batch; the
    // store left-anti only filters prior segments, so without the
    // batch-local dropDuplicates the id's rows land twice in the
    // append-only segment (r7 ADVICE)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = Files.createTempDirectory("dedup-index-dup").toString
    val batch = docs.limit(40).unionByName(docs.limit(15)) // 15 ids twice
    val r = DedupIndex.update(spark, root, batch, "doc_id", "text",
      threshold = 0.8)
    assert(DedupIndex.currentSets(spark, root).count() == 40,
      "each id exactly once in the segment")
    assert(r.pairs.filter(col("a") === col("b")).isEmpty,
      "no degenerate self-pairs")
    // the duplicate must also not fan out future verdicts: re-check
    // the same 15 docs under fresh ids — a store id indexed twice
    // would match its sets row twice and emit each (a, b) verdict
    // twice (candidate distinct() cannot dedup a sets-join fan-out)
    val probe = docs.limit(15).withColumn("doc_id",
      col("doc_id") + 1000000L)
    val p2 = DedupIndex.update(spark, root, probe, "doc_id", "text",
      threshold = 0.8).pairs
    assert(p2.filter(col("b") >= 1000000L).count() > 0,
      "probes are exact copies — pairs must exist")
    assert(p2.groupBy("a", "b").count().filter(col("count") > 1).isEmpty,
      "a store id indexed twice would emit duplicate verdict rows")
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

  test("segment compaction: content identical, fewer files, detection " +
      "unchanged, crashed source-cleanup invisible then vacuumable") {
    import org.apache.hadoop.fs.Path
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = Files.createTempDirectory("dedup-index-compact").toString
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def parquetFiles(): Int = {
      val it = fs.listFiles(new Path(root), true); var n = 0
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    // a streaming-shaped store: many tiny segments (one per batch)
    val probe = docs.filter(col("doc_id") >= 150)
    (0 until 5).foreach { i =>
      DedupIndex.update(spark, root,
        docs.filter(col("doc_id") % 5 === i && col("doc_id") < 150),
        "doc_id", "text", threshold = 0.8)
    }
    val bandsBefore = DedupIndex.currentBands(spark, root)
      .collect().map(_.toSeq).toSet
    val setsBefore = DedupIndex.currentSets(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    val filesBefore = parquetFiles()

    val seg = DedupIndex.compactSegments(spark, root)
    assert(seg.nonEmpty)
    assert(DedupIndex.segments(spark, root) == Seq(seg.get),
      "compacted store must expose exactly the merged segment")
    assert(DedupIndex.currentBands(spark, root)
      .collect().map(_.toSeq).toSet == bandsBefore)
    assert(DedupIndex.currentSets(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
      == setsBefore)
    assert(parquetFiles() < filesBefore,
      s"compaction must shrink the file count (was $filesBefore)")
    // detection over the compacted store == over an uncompacted twin
    val twin = Files.createTempDirectory("dedup-index-twin").toString
    (0 until 5).foreach { i =>
      DedupIndex.update(spark, twin,
        docs.filter(col("doc_id") % 5 === i && col("doc_id") < 150),
        "doc_id", "text", threshold = 0.8)
    }
    val pc = pairSet(DedupIndex.update(spark, root, probe,
      "doc_id", "text", threshold = 0.8).pairs)
    val pu = pairSet(DedupIndex.update(spark, twin, probe,
      "doc_id", "text", threshold = 0.8).pairs)
    assert(pc.nonEmpty && pc == pu,
      "probe batch must find identical pairs on compacted vs raw store")

    // crashed cleanup: a committed source dir that compaction failed
    // to delete is SHADOWED (readers unaffected), then vacuumable
    val before = DedupIndex.currentSets(spark, root).count()
    val relic = "seg-0000000000000-0000"
    DedupIndex.currentSets(spark, root).limit(3)
      .write.parquet(s"$root/$relic/sets")
    DedupIndex.currentBands(spark, root).limit(3)
      .write.parquet(s"$root/$relic/bands")
    fs.create(new Path(root, s"$relic/_SUCCESS"), true).close()
    val cur = {
      val in = fs.open(new Path(root, s"${seg.get}/_sources"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out = fs.create(new Path(root, s"${seg.get}/_sources"), true)
    try out.write(s"$cur\n$relic".getBytes("UTF-8")) finally out.close()
    assert(DedupIndex.currentSets(spark, root).count() == before,
      "shadowed relic must be invisible to readers")
    // transitive shadowing: a SECOND compaction deletes the first
    // compaction target — whose _sources were the only mention of the
    // relic — and must carry the shadow closure forward, or the relic
    // resurrects and double-counts
    assert(DedupIndex.segments(spark, root).size == 2) // compacted + probe
    assert(DedupIndex.compactSegments(spark, root).nonEmpty)
    assert(!fs.exists(new Path(root, seg.get)),
      "second compaction should have deleted the first target")
    assert(DedupIndex.currentSets(spark, root).count() == before,
      "relic must STAY shadowed after its shadowing segment is compacted away")
    val dead = DedupIndex.vacuumShadowed(spark, root)
    assert(dead.contains(relic))
    assert(!fs.exists(new Path(root, relic)))
    assert(DedupIndex.currentSets(spark, root).count() == before)
  }

  test("re-ingesting an already-indexed id is dropped: no duplicate " +
      "store rows, no (id,id) self-pairs, first write wins") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = Files.createTempDirectory("dedup-index-reingest").toString
    val first = docs.filter(col("doc_id") < 80)
    DedupIndex.update(spark, root, first, "doc_id", "text", threshold = 0.8)
    // second batch overlaps the first (an at-least-once source
    // re-delivering) and adds genuinely new docs
    val second = docs.filter(col("doc_id") >= 40 && col("doc_id") < 120)
    val res = DedupIndex.update(spark, root, second, "doc_id", "text",
      threshold = 0.8)
    assert(DedupIndex.currentSets(spark, root).count() ==
      docs.filter(col("doc_id") < 120).count(),
      "overlapping ids must not duplicate store rows")
    assert(res.pairs.filter(col("a") === col("b")).count() == 0,
      "re-ingested ids must not emit self-pairs")
    // detection is unharmed: the full incremental pair set still
    // equals the bulk pipeline over the distinct corpus
    val bulk = pairSet(Dedup.minhashNearDups(
      docs.filter(col("doc_id") < 120), "doc_id", "text", threshold = 0.8))
    val firstPairs = pairSet(Dedup.minhashNearDups(
      first, "doc_id", "text", threshold = 0.8))
    assert(firstPairs.union(pairSet(res.pairs)) == bulk)
  }

  test("bulkLoad bootstraps the index without pair detection; a " +
      "subsequent update detects against it exactly (r9)") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val root = Files.createTempDirectory("dedup-index-bulk").toString
    val first = docs.filter(col("doc_id") < 110)
    val second = docs.filter(col("doc_id") >= 110)
    DedupIndex.bulkLoad(spark, root, first, "doc_id", "text",
      threshold = 0.8)
    assert(DedupIndex.currentSets(spark, root).count() == first.count(),
      "bulkLoad must index every doc")
    // an overlapping re-load is first-write-wins like update()
    DedupIndex.bulkLoad(spark, root,
      docs.filter(col("doc_id") < 30), "doc_id", "text", threshold = 0.8)
    assert(DedupIndex.currentSets(spark, root).count() == first.count(),
      "re-loaded ids must not duplicate store rows")
    // detection over the bootstrapped store: the update's verdicts
    // are exactly the bulk pipeline's pairs touching the second half
    val res = DedupIndex.update(spark, root, second, "doc_id", "text",
      threshold = 0.8)
    val secondIds = second.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expected = pairSet(
      Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
      .filter(p => secondIds(p._1) || secondIds(p._2))
    assert(expected.nonEmpty, "corpus must contain cross-half pairs")
    assert(pairSet(res.pairs) == expected,
      "update over a bulkLoaded store must equal the bulk pipeline's " +
        "pairs that involve the new batch")
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
