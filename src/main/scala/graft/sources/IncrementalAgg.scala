package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the lakehouse "incremental
  * materialized view" pattern, and the only way corpus-level
  * statistics survive at 100 TB: fold each NEW batch's partial
  * aggregate into a persisted state table instead of re-scanning
  * the whole corpus per refresh. Works for any aggregate whose
  * merge is associative+commutative on its partials (counts, sums,
  * min/max, and every sketch in this library — HLL, CMS, Bloom,
  * Space-Saving all advertise exactly this property; that
  * mergeability is WHY they're the 100 TB forms).
  *
  * Concrete instance here: corpus token counts (the state behind
  * t_vocab / heavy hitters / the perplexity LMs). Per update the
  * batch is scanned ONCE map-side, partials shuffle at vocabulary
  * size, the prior state (also vocabulary-sized) unions in, and the
  * merged state lands in a fresh `_SUCCESS`-gated version dir —
  * readers never see a torn write and the prior version is the
  * rollback (same crash contract as GraphStore; prune/GC composes).
  * Cost per refresh: O(batch) scan + O(vocab) shuffle — the corpus
  * is never re-read. */
object IncrementalAgg {

  private def versions(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .filter(_.startsWith("v")).sorted
      .filter(v => fs.exists(new Path(root, s"$v/_SUCCESS")))
  }

  /** Latest committed token-count state; empty frame when none. */
  def currentTokenCounts(spark: SparkSession, root: String): DataFrame =
    versions(spark, root).lastOption match {
      case Some(v) => spark.read.parquet(s"$root/$v")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "token STRING, n BIGINT"))
    }

  /** Fold one new batch into the state; returns the version name. */
  def updateTokenCounts(spark: SparkSession, root: String,
      newDocs: DataFrame, textCol: String = "text"): String = {
    val batch = newDocs
      .select(explode(graft.text.TextAnalysis.wsTokens(col(textCol)))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val merged = currentTokenCounts(spark, root)
      .unionByName(batch)
      .groupBy("token").agg(sum("n").as("n"))
    // GraphStore's version convention (GraphStore.nextVersion):
    // timestamp + monotone sequence suffix. A bare timestamp collides
    // when two updates land in the same millisecond (second write
    // throws on the existing dir) and a clock step-back could sort a
    // newer state before an older one; the sequence suffix keeps
    // names unique and same-process ordering monotone either way.
    val v = f"v${System.currentTimeMillis()}%013d-${
      saveSeq.incrementAndGet()}%04d"
    merged.write.parquet(s"$root/$v")
    v
  }

  private val saveSeq = new java.util.concurrent.atomic.AtomicLong()
}
