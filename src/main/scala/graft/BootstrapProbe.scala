package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.{DedupIndex, IndexLayout}
import graft.streaming.StreamingDedup

/** Rehearsal probe for the documented 100 TB bootstrap-to-streaming
  * recipe, composed end-to-end (not part of the library surface).
  * The pieces are individually spec'd (bulkLoad, compactSegments,
  * StreamingDedup, auto-compaction, kill recovery); this runs the
  * JOURNEY on a real corpus and a real multi-executor fabric:
  *
  *  1. `bulk`    — bulkLoad the historical corpus in chunks (no pair
  *                 detection), then compactSegments → the P-way
  *                 bucketed probe layout.
  *  2. `stream1` — stage fresh arrivals into a file-source inbox,
  *                 drain with AvailableNow + a small
  *                 maxFilesPerTrigger so MANY micro-batches commit
  *                 and tiered auto-compaction fires on the hot path.
  *  3. `stream2` — stage more arrivals; the harness SIGKILLs an
  *                 executor mid-drain (tools/bootstrap64.sh).
  *  4. `resume`  — restart the checkpoint, let the torn batch
  *                 replay, verify: every doc indexed exactly once
  *                 and the streamed verdict set == the bulk
  *                 pipeline's pairs that involve the streamed docs
  *                 (the bootstrap half is indexed WITHOUT
  *                 self-detection by design, so store×store pairs
  *                 inside it are intentionally absent).
  *  5. `probecheck` — pin that the store probes are STILL pruned
  *                 after the whole journey (bulk loads, compaction,
  *                 auto-compaction folds, a crash and its replay):
  *                 a small batch's band/set probes must decode a
  *                 tiny fraction of the store (FileSourceScanExec
  *                 numOutputRows, the PlanAuditSpec check at probe
  *                 scale).
  *
  * Corpus from SPARK_GRAFT_SF_DIR (a make8x replica corpus); docs
  * with replica index < SPLIT (default: all but the two highest)
  * bootstrap, the rest stream.
  */
object BootstrapProbe {
  def main(args: Array[String]): Unit = {
    val Array(phase, base) = args.take(2)
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val in = s"$base/in"; val root = s"$base/index"
    val ckpt = s"$base/ckpt"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft64x")
    val off = 10000000L
    val threshold = 0.8
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nRep = (docs.agg(max(col("doc_id"))).head().getLong(0) / off + 1).toInt
    require(nRep >= 4, s"bootstrap probe needs a replica corpus, got $nRep")
    val split = sys.env.get("SPARK_GRAFT_SPLIT").map(_.toInt)
      .getOrElse(nRep - 2)
    def repOf(c: org.apache.spark.sql.Column) = (c / off).cast("int")
    val bootDocs = docs.filter(repOf(col("doc_id")) < split)
    val streamDocs = docs.filter(repOf(col("doc_id")) >= split)

    def stage(tag: String, part: org.apache.spark.sql.DataFrame,
        nFiles: Int): Unit = {
      val st = s"$base/stage-$tag"
      part.repartition(nFiles).write.mode("overwrite").parquet(st)
      new java.io.File(in).mkdirs()
      // atomic appearance in the inbox: write staged, then rename
      java.nio.file.Files.list(java.nio.file.Paths.get(st))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach { p =>
          java.nio.file.Files.move(p, java.nio.file.Paths.get(in,
            s"$tag-${p.getFileName.toString}"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
    }

    def drain(): Option[String] = {
      val q = StreamingDedup.start(
        spark.readStream.schema("doc_id BIGINT, text STRING")
          // small trigger => many real micro-batches => the tiered
          // auto-compaction path actually exercises on this journey
          .option("maxFilesPerTrigger", "2").parquet(in),
        "doc_id", "text", threshold, root, ckpt, availableNow = true)
      try { q.awaitTermination(); None }
      catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").take(300)}")
      }
    }

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
    def segStats(): String = {
      val segs = DedupIndex.segments(spark, root)
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val lay = IndexLayout.readLayouts(fs,
        new org.apache.hadoop.fs.Path(root))
      val bucketed = segs.count(s =>
        lay.get(s).exists(_.values.exists(_.nonEmpty)))
      s""""segments":${segs.size},"bucketed_segments":$bucketed"""
    }

    phase match {
      case "bulk" =>
        val t0 = System.nanoTime()
        for (g <- (0 until split).grouped(math.max(1, split / 4))) {
          val chunk = bootDocs.filter(
            repOf(col("doc_id")) >= g.head && repOf(col("doc_id")) <= g.last)
          DedupIndex.bulkLoad(spark, root, chunk, "doc_id", "text",
            threshold)
          println(s"bulk: loaded replicas ${g.head}..${g.last}")
        }
        val compacted = DedupIndex.compactSegments(spark, root)
        val dt = (System.nanoTime() - t0) / 1e9
        val n = DedupIndex.currentSets(spark, root).count()
        println(s"""{"phase":"bulk","sec":$dt,"indexed":$n,"compacted":${
          jstr(compacted.getOrElse("none"))},${segStats()}}""")
      case "stream1" =>
        stage("s1", streamDocs.filter(pmod(col("doc_id"), lit(2)) === 0), 12)
        val err = drain()
        println(s"""{"phase":"stream1","err":${jerr(err)},${segStats()}}""")
      case "stream2" =>
        stage("s2", streamDocs.filter(pmod(col("doc_id"), lit(2)) === 1), 12)
        val err = drain()
        println(s"""{"phase":"stream2","err":${jerr(err)},${segStats()}}""")
      case "resume" =>
        val err = drain()
        val nDocs = docs.count()
        val nSets = DedupIndex.currentSets(spark, root).count()
        // oracle scope: the bootstrap half is indexed WITHOUT
        // self-detection (bulkLoad's contract), so the expected
        // verdicts are the bulk pipeline's pairs INVOLVING streamed
        // docs — cross (stream × boot) and within-stream
        val streamed = StreamingDedup.currentPairs(spark, root)
          .select("a", "b").distinct()
        val bulk = Dedup.minhashNearDups(docs, "doc_id", "text", threshold)
          .filter(repOf(col("a")) >= split || repOf(col("b")) >= split)
          .select("a", "b").distinct()
        val nStreamed = streamed.count()
        val missing = bulk.exceptAll(streamed).count()
        val extra = streamed.exceptAll(bulk).count()
        println(s"""{"phase":"resume","err":${jerr(err)},"docs":$nDocs,"indexed":$nSets,"streamed_pairs":$nStreamed,"missing_vs_bulk":$missing,"extra_vs_bulk":$extra,${segStats()}}""")
      case "probecheck" =>
        import org.apache.spark.sql.execution.FileSourceScanExec
        val segs = DedupIndex.segments(spark, root)
        val p = 64 // defaultProbeBuckets — pinned in the store meta
        val storeRows = DedupIndex.currentSets(spark, root).count()
        val batch = docs.limit(200)
        val decoded = IndexLayout.withProbePushdown(spark) {
          val ids = IndexLayout.collectKeys(
            batch.select("doc_id").distinct(), p, 1000000, "probe ids")
          val d = DedupIndex.probeSets(spark, root, segs, p, ids)
          d.collect()
          d.queryExecution.executedPlan
            .collect { case s: FileSourceScanExec => s }
            .map(_.metrics("numOutputRows").value).sum
        }
        println(s"""{"phase":"probecheck","store_rows":$storeRows,"probe_decoded":$decoded,"pruned":${decoded < storeRows / 10}}""")
      case other => sys.error(s"unknown phase: $other")
    }
    spark.stop()
  }
}
