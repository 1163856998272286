package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.DedupIndex
import graft.streaming.StreamingDedup

/** Dedup-on-arrival over a REAL file source with a real checkpoint —
  * the deployment shape (StreamingDedupSpec's MemoryStream pins the
  * per-batch semantics; this pins the restart contract around it):
  *  - each start/stop cycle is a kill-and-resume (AvailableNow);
  *  - a restart with no new files must NOT reprocess old ones (the
  *    store's segment list stays put);
  *  - a restart with new files dedups ONLY those against the store;
  *  - full redelivery against a FRESH checkpoint converges: batch
  *    ids restart at 0 but the fresh checkpoint carries a fresh
  *    EPOCH, so the redelivered batch lands in its own segment, the
  *    first-wins re-ingest guard drops already-indexed ids, and the
  *    verdict SET equals the bulk pipeline's (the pairs log is a
  *    fact log — redelivery may restate a fact with a new batch id,
  *    never invent or lose one);
  *  - a checkpoint RESET over a kept store must not swallow NEW
  *    documents whose batch id collides with a previously committed
  *    one (r7 ADVICE: without the epoch key this was silent data
  *    loss). */
class StreamingDedupFileSpec extends AnyFunSuite with SparkFixture {

  private def deleteDir(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  private def drop(dir: String, name: String, rows: Seq[String]): Unit = {
    val tmp = java.nio.file.Files.createTempFile("graft-sdedup", ".json")
    java.nio.file.Files.writeString(tmp, rows.mkString("", "\n", "\n"))
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a", "b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("file-source dedup stream: resume processes only new files, " +
      "fresh-checkpoint redelivery converges to the bulk verdicts") {
    import spark.implicits._
    val base = "/tmp/graft-test-sdedup-file"
    deleteDir(base)
    val in = s"$base/in"; val root = s"$base/index"
    val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").localCheckpoint()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    def json(r: (Long, String)) = {
      // control chars escaped too: a raw newline would split one
      // record across lines and misdiagnose as an exactly-once bug
      val t = r._2.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s"""{"doc_id": ${r._1}, "text": "$t"}"""
    }
    val third = rows.length / 3

    def run(checkpoint: String): Unit = {
      val stream = spark.readStream
        .schema("doc_id BIGINT, text STRING").json(in)
      val q = StreamingDedup.start(stream, "doc_id", "text",
        threshold = 0.8, root, checkpoint, availableNow = true)
      q.awaitTermination()
    }

    // cycle 1: first file
    drop(in, "f1.json", rows.take(third).map(json))
    run(ckpt)
    val segsAfter1 = DedupIndex.segments(spark, root)
    assert(segsAfter1.nonEmpty)

    // cycle 2: nothing new — the restart must not touch the store
    run(ckpt)
    assert(DedupIndex.segments(spark, root) == segsAfter1,
      "an empty restart must not add segments or rewrite old ones")

    // cycle 3: two more files fold in against the prior store
    drop(in, "f2.json", rows.slice(third, 2 * third).map(json))
    drop(in, "f3.json", rows.drop(2 * third).map(json))
    run(ckpt)
    assert(DedupIndex.currentSets(spark, root).count() == rows.length)
    val bulk = pairSet(Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8))
    assert(bulk.nonEmpty)
    assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk)

    // full redelivery, FRESH checkpoint: same files, batch ids reset —
    // the store must not double and the verdict set must not change
    run(s"$base/ckpt2")
    assert(DedupIndex.currentSets(spark, root).count() == rows.length,
      "fresh-checkpoint redelivery must not duplicate the store")
    assert(pairSet(StreamingDedup.currentPairs(spark, root)) == bulk,
      "fresh-checkpoint redelivery must not change the verdict set")

    // checkpoint RESET, store kept, and a genuinely NEW document in
    // the first batch of the new incarnation — its batch id (0)
    // collides with ids every prior incarnation committed; the epoch
    // key must keep the replay guard from swallowing it
    val newId = rows.map(_._1).max + 1
    drop(in, "f4.json", Seq(json((newId, rows.head._2))))
    run(s"$base/ckpt3")
    assert(DedupIndex.currentSets(spark, root).count() == rows.length + 1,
      "a new doc after checkpoint reset must be indexed, not " +
        "swallowed by a colliding committed batch id")
    assert(pairSet(StreamingDedup.currentPairs(spark, root))
      .contains((rows.head._1, newId)),
      "the new doc's near-dup pair against the old store must surface")

    // checkpoint reset at the SAME PATH, same JVM (r8 review): delete
    // the checkpoint and restart at the identical location. Spark
    // writes a fresh query id to <ckpt>/metadata, and the epoch must
    // be re-read — a path-keyed epoch cache would revive the stale
    // epoch, land the new incarnation's batch 0 on the OLD epoch's
    // committed segment, and silently swallow the new document.
    deleteDir(s"$base/ckpt3")
    val newId2 = newId + 1
    drop(in, "f5.json", Seq(json((newId2, rows.head._2))))
    run(s"$base/ckpt3")
    assert(DedupIndex.currentSets(spark, root).count() == rows.length + 2,
      "a new doc after a SAME-PATH checkpoint reset must be indexed " +
        "(stale cached epoch would swallow it)")
    assert(pairSet(StreamingDedup.currentPairs(spark, root))
      .contains((rows.head._1, newId2)),
      "the new doc's pair must surface after the same-path reset")
    deleteDir(base)
  }
}
