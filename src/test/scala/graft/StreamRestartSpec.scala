package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DocumentIngest, GraphStore, StreamingIngest}
import graft.sources.DocumentIngest.IndexSpec

/** End-to-end streaming ingest over a REAL file source with a real
  * checkpoint directory — the deployment shape (MemoryStream in
  * ApiSpec pins the per-batch merge semantics; this pins the
  * restart/recovery contract around it):
  *  - each start/stop cycle is a kill-and-resume (AvailableNow
  *    drains what's there, then the query dies; the next start
  *    resumes from the checkpoint's committed offsets);
  *  - a restart with no new files must NOT reprocess old ones
  *    (exactly-once at the source: the epoch stays put);
  *  - a restart with new files processes ONLY those, folding into
  *    the prior store state;
  *  - full redelivery (fresh checkpoint, same input dir) must
  *    CONVERGE: the latest-wins upsert makes batch replay — Spark's
  *    crash-recovery unit of work — idempotent on the store.
  */
class StreamRestartSpec extends AnyFunSuite with SparkFixture {

  private def deleteDir(p: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))

  /** Atomic file drop: the file source lists the directory between
    * batches, so write outside and move in — a partially written
    * JSON file would otherwise be picked up torn. */
  private def drop(dir: String, name: String, rows: Seq[String]): Unit = {
    val tmp = java.nio.file.Files.createTempFile("graft-stream", ".json")
    java.nio.file.Files.writeString(tmp,
      rows.mkString("", "\n", "\n"))
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def nodeVersionsOnDisk(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/nodes")
    if (!d.exists()) Seq.empty
    else d.list().filter(_.startsWith("v")).toSeq.sorted
  }

  test("file-source ingest: kill-and-resume cycles are exactly-once, " +
      "redelivery converges") {
    val base = "/tmp/graft-test-filestream"
    deleteDir(base)
    val in = s"$base/in"; val root = s"$base/store"
    val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val specs = Seq(IndexSpec("capital", "text", Seq("capital")))

    def run(checkpoint: String): Unit = {
      val stream = spark.readStream
        .schema("key STRING, doc STRING, ts TIMESTAMP")
        .json(in)
      val q = StreamingIngest.start(stream, "key", "doc", "ts", specs,
        root, checkpoint, availableNow = true)
      q.awaitTermination()
    }
    def latest(): Map[String, String] =
      GraphStore.loadNodes(spark, root)
        .select("key_data", "details").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap

    // cycle 1: two keys, one written twice (last version wins)
    drop(in, "b1.json", Seq(
      """{"key":"india","doc":"{\"capital\":\"Calcutta\"}","ts":"2020-01-01T00:00:00Z"}""",
      """{"key":"india","doc":"{\"capital\":\"New Delhi\"}","ts":"2020-01-02T00:00:00Z"}""",
      """{"key":"usa","doc":"{\"capital\":\"Washington\"}","ts":"2020-01-01T00:00:00Z"}"""))
    run(ckpt)
    val s1 = latest()
    assert(s1.keySet == Set("india", "usa"))
    assert(s1("india").contains("New Delhi"))
    val e1 = GraphStore.currentEpoch(spark, root)
    val v1 = nodeVersionsOnDisk(root)
    assert(v1.nonEmpty && e1.get("nodes").exists(v1.contains))

    // cycle 2 (kill-and-resume, nothing new): the checkpoint's
    // committed offsets mean b1 must NOT be reprocessed — no new
    // store version, the epoch pin does not move
    run(ckpt)
    assert(GraphStore.currentEpoch(spark, root) == e1,
      "restart with no new files moved the epoch — old batch reprocessed")
    assert(nodeVersionsOnDisk(root) == v1)

    // cycle 3 (kill-and-resume, new file): only b2 is processed,
    // folding into the prior state — update india, insert japan
    drop(in, "b2.json", Seq(
      """{"key":"india","doc":"{\"capital\":\"Delhi\"}","ts":"2020-02-01T00:00:00Z"}""",
      """{"key":"japan","doc":"{\"capital\":\"Tokyo\"}","ts":"2020-02-01T00:00:00Z"}"""))
    run(ckpt)
    val s3 = latest()
    assert(s3.keySet == Set("india", "usa", "japan"))
    assert(s3("india").contains("\"Delhi\"") && s3("japan").contains("Tokyo"))
    val e3 = GraphStore.currentEpoch(spark, root)
    assert(e3("nodes") != e1("nodes"), "new batch did not commit an epoch")
    // indexes moved with the nodes under the SAME epoch flip
    val ix = GraphStore.loadIndexes(spark, root)
    assert(ix.filter(col("key_str") === "Delhi").count() == 1 &&
      ix.filter(col("key_str") === "New Delhi").count() == 0)

    // redelivery: a fresh checkpoint replays EVERY file against the
    // existing store — Spark re-runs a batch whose offset commit was
    // lost in a crash, so batch replay must converge, not duplicate
    run(s"$base/ckpt2")
    val s4 = latest()
    assert(s4 == s3, "full redelivery changed the store state — " +
      "upsert replay is not idempotent")
    // and the replayed epochs still resolve (commits happened, state
    // just converged to the same latest-per-key rows)
    assert(GraphStore.currentEpoch(spark, root)("nodes") != e3("nodes"))
  }
}
