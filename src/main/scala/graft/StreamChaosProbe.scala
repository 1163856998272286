package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.DedupIndex
import graft.streaming.StreamingDedup

/** Chaos probe for the streaming exactly-once protocol (not part of
  * the library surface): drives dedup-on-arrival over a REAL file
  * source on a REAL multi-executor fabric while the harness SIGKILLs
  * an executor mid-batch, then verifies the store and verdict log
  * converge to the bulk pipeline's answer anyway.
  *
  * The unit specs (StreamingDedupSpec / StreamingDedupFileSpec)
  * SIMULATE the crash points — torn batch, committed-batch replay,
  * checkpoint reset. This probe produces the real thing: a live kill
  * lands wherever it lands (mid shuffle, mid parquet write, between
  * the segment commit and the pairs marker), Spark's own retry /
  * failure machinery runs, and the recovery contract has to hold
  * against actual partial writes, not injected ones.
  *
  * Phases (arg 1; arg 2 = base dir; corpus from SPARK_GRAFT_SF_DIR):
  *  - `feed1`: stage the even-id half of `documents` into the inbox,
  *    drain it with an AvailableNow stream — the pre-existing store.
  *  - `feed2`: stage the odd-id half, drain — the harness kills an
  *    executor during this batch. Under graft.checkpoint.mode=local
  *    the batch dies (lineage-truncated blocks are lost); the probe
  *    prints the failure instead of crashing.
  *  - `resume`: restart the same checkpoint (AvailableNow), let the
  *    torn batch replay, then print one JSON line: segments, store
  *    row invariants, and streamed-vs-bulk verdict-set equality over
  *    the FULL corpus.
  */
object StreamChaosProbe {
  def main(args: Array[String]): Unit = {
    val Array(phase, base) = args.take(2)
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val in = s"$base/in"; val root = s"$base/index"
    val ckpt = s"$base/ckpt"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft64x")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val threshold = 0.8

    def stage(half: Int): Unit = {
      val st = s"$base/stage$half"
      docs.filter(pmod(col("doc_id"), lit(2)) === half)
        .coalesce(4).write.mode("overwrite").parquet(st)
      new java.io.File(in).mkdirs()
      // the file source requires files to APPEAR atomically: write to
      // a staging dir, then same-filesystem rename into the inbox
      java.nio.file.Files.list(java.nio.file.Paths.get(st))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach { p =>
          java.nio.file.Files.move(p, java.nio.file.Paths.get(in,
            s"h$half-${p.getFileName.toString}"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
    }

    def drain(): Option[String] = {
      val q = StreamingDedup.start(
        spark.readStream.schema("doc_id BIGINT, text STRING").parquet(in),
        "doc_id", "text", threshold, root, ckpt, availableNow = true)
      try { q.awaitTermination(); None }
      catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").take(300)}")
      }
    }

    // Spark failure messages carry newlines/quotes/backslashes — a
    // naive interpolation tears the one-JSON-line-per-phase contract
    // in exactly the kill case this probe exists to record
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jerr(err: Option[String]): String = err.map(jstr).getOrElse("null")

    phase match {
      case "feed1" =>
        stage(0)
        val err = drain()
        println(s"""{"phase":"feed1","err":${jerr(err)},"segments":${DedupIndex.segments(spark, root).size}}""")
      case "feed2" =>
        stage(1)
        val err = drain()
        println(s"""{"phase":"feed2","err":${jerr(err)},"segments":${DedupIndex.segments(spark, root).size}}""")
      case "resume" =>
        val err = drain()
        // invariants after recovery: every doc indexed exactly once,
        // and the verdict set equals the bulk pipeline's on the same
        // corpus (the pairs log is a fact log — batch ids may differ,
        // the (a,b) fact set may not)
        val nDocs = docs.count()
        val nSets = DedupIndex.currentSets(spark, root).count()
        val streamed = StreamingDedup.currentPairs(spark, root)
          .select("a", "b").distinct()
        val bulk = Dedup.minhashNearDups(docs, "doc_id", "text", threshold)
          .select("a", "b").distinct()
        val nStreamed = streamed.count()
        val missing = bulk.exceptAll(streamed).count()
        val extra = streamed.exceptAll(bulk).count()
        println(s"""{"phase":"resume","err":${jerr(err)},"segments":${DedupIndex.segments(spark, root).size},"docs":$nDocs,"indexed":$nSets,"streamed_pairs":$nStreamed,"missing_vs_bulk":$missing,"extra_vs_bulk":$extra}""")
      case other => sys.error(s"unknown phase: $other")
    }
    spark.stop()
  }
}
