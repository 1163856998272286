package graft

import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.sources.{EmbeddingDedupIndex, IndexLayout}
import graft.streaming.StreamingEmbeddingDedup

/** Rehearsal probe for the EMBEDDING bootstrap-to-streaming journey
  * (r10 verdict #6 — the vector twin of [[BootstrapProbe]]), composed
  * end-to-end on a real multi-executor fabric:
  *
  *  1. `bulk`    — bulkLoad the historical vectors in chunks (no pair
  *                 detection) at a SMALL creation geometry, then
  *                 compactSegments → the bucketed probe layout.
  *  2. `reband`  — migrate in place to the corpus-sized geometry
  *                 (more bands, more bits): the crash-safe `_reband`
  *                 intent protocol over the persisted vectors.
  *  3. `stream1` — stage arrivals into a file-source inbox, drain
  *                 with AvailableNow + small maxFilesPerTrigger so
  *                 many micro-batches commit and tiered
  *                 auto-compaction fires on the hot path.
  *  4. `stream2` — stage more arrivals; the harness SIGKILLs an
  *                 executor mid-drain (tools/ebootstrap.sh).
  *  5. `resume`  — restart the checkpoint, let the torn batch
  *                 replay, verify: every vector indexed exactly
  *                 once and the streamed verdicts == the bulk
  *                 `nearDupPairsLsh` pairs (at the POST-reband
  *                 geometry) that involve streamed vectors.
  *  6. `probecheck` — the store still probe-prunes after the whole
  *                 journey (loads, compaction, reband, folds, a
  *                 crash and its replay).
  *
  * Corpus from SPARK_GRAFT_SF_DIR (a makevec/make8x replica corpus);
  * replicas < SPLIT bootstrap, the rest stream.
  */
object EBootstrapProbe {
  def main(args: Array[String]): Unit = {
    val Array(phase, base) = args.take(2)
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val in = s"$base/in"; val root = s"$base/index"
    val ckpt = s"$base/ckpt"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft64x")
    val off = 10000000L
    val dim = 64
    val threshold = 0.9
    // creation geometry (bulk) vs corpus-sized target (reband)
    val (bands0, bits0) = (6, 7)
    val (bands1, bits1, maxB) = (10, 9, 500)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nRep = (vecs.agg(max(col("vec_id"))).head().getLong(0) / off + 1).toInt
    require(nRep >= 4, s"ebootstrap probe needs a replica corpus, got $nRep")
    val split = sys.env.get("SPARK_GRAFT_SPLIT").map(_.toInt)
      .getOrElse(nRep - 2)
    def repOf(c: org.apache.spark.sql.Column) = (c / off).cast("int")
    val bootVecs = vecs.filter(repOf(col("vec_id")) < split)
    val streamVecs = vecs.filter(repOf(col("vec_id")) >= split)

    def stage(tag: String, part: org.apache.spark.sql.DataFrame,
        nFiles: Int): Unit = {
      val st = s"$base/stage-$tag"
      part.repartition(nFiles).write.mode("overwrite").parquet(st)
      new java.io.File(in).mkdirs()
      java.nio.file.Files.list(java.nio.file.Paths.get(st))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .forEach { p =>
          java.nio.file.Files.move(p, java.nio.file.Paths.get(in,
            s"$tag-${p.getFileName.toString}"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
    }

    def drain(): Option[String] = {
      val q = StreamingEmbeddingDedup.start(
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", "2").parquet(in),
        "vec_id", "embedding", dim, threshold, root, ckpt,
        bands = bands1, bits = bits1, maxBucket = maxB,
        availableNow = true)
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
      val segs = EmbeddingDedupIndex.segments(spark, root)
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
          val chunk = bootVecs.filter(
            repOf(col("vec_id")) >= g.head && repOf(col("vec_id")) <= g.last)
          EmbeddingDedupIndex.bulkLoad(spark, root, chunk, "vec_id",
            "embedding", dim, threshold, bands0, bits0, maxB)
          println(s"bulk: loaded replicas ${g.head}..${g.last}")
        }
        val compacted = EmbeddingDedupIndex.compactSegments(spark, root)
        val dt = (System.nanoTime() - t0) / 1e9
        val n = EmbeddingDedupIndex.currentVecs(spark, root).count()
        println(s"""{"phase":"bulk","sec":$dt,"indexed":$n,"compacted":${
          jstr(compacted.getOrElse("none"))},${segStats()}}""")
      case "reband" =>
        val t0 = System.nanoTime()
        val seg = EmbeddingDedupIndex.reband(spark, root, bands1, bits1,
          maxB)
        val dt = (System.nanoTime() - t0) / 1e9
        println(s"""{"phase":"reband","sec":$dt,"segment":${jstr(seg)},${
          segStats()}}""")
      case "stream1" =>
        stage("s1", streamVecs.filter(pmod(col("vec_id"), lit(2)) === 0), 12)
        val err = drain()
        println(s"""{"phase":"stream1","err":${jerr(err)},${segStats()}}""")
      case "stream2" =>
        stage("s2", streamVecs.filter(pmod(col("vec_id"), lit(2)) === 1), 12)
        val err = drain()
        println(s"""{"phase":"stream2","err":${jerr(err)},${segStats()}}""")
      case "resume" =>
        val err = drain()
        val nVecs = vecs.count()
        val nStore = EmbeddingDedupIndex.currentVecs(spark, root).count()
        // oracle: bulk LSH pairs at the POST-reband geometry,
        // restricted to pairs involving streamed vectors (the
        // bootstrap half is indexed WITHOUT self-detection)
        val streamed = StreamingEmbeddingDedup.currentPairs(spark, root)
          .select("a", "b").distinct()
        val bulk = Knn.nearDupPairsLsh(vecs, "vec_id", "embedding", dim,
            threshold, bands1, bits1, maxB)
          .filter(repOf(col("a")) >= split || repOf(col("b")) >= split)
          .select("a", "b").distinct()
        val nStreamed = streamed.count()
        val missing = bulk.exceptAll(streamed).count()
        val extra = streamed.exceptAll(bulk).count()
        println(s"""{"phase":"resume","err":${jerr(err)},"vecs":$nVecs,"indexed":$nStore,"streamed_pairs":$nStreamed,"missing_vs_bulk":$missing,"extra_vs_bulk":$extra,${segStats()}}""")
      case "probecheck" =>
        import org.apache.spark.sql.execution.FileSourceScanExec
        val segs = EmbeddingDedupIndex.segments(spark, root)
        val p = IndexLayout.defaultProbeBuckets(spark)
        val storeRows = EmbeddingDedupIndex.currentVecs(spark, root).count()
        val probeN = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "200").toInt
        val batch = vecs.limit(probeN)
        val decoded = IndexLayout.withProbePushdown(spark) {
          val ids = IndexLayout.collectKeys(
            batch.select("vec_id").distinct(), p, 1000000, "probe ids")
          val d = EmbeddingDedupIndex.probeVecs(spark, root, segs, p, ids)
          d.collect()
          d.queryExecution.executedPlan
            .collect { case s: FileSourceScanExec => s }
            .map(_.metrics("numOutputRows").value).sum
        }
        // the probe contract is O(batch) decode with a per-key page
        // constant, INDEPENDENT of store size — so the pass criterion
        // is per-key-bounded (≤ ~2 pages × pageRows, with scan-group
        // chain over-read headroom) OR the classic store fraction for
        // stores big enough that the fraction is the sharper bound
        val perKey = if (probeN > 0) decoded / probeN else 0L
        val ok = decoded < storeRows / 10 ||
          decoded <= probeN.toLong * 8 * IndexLayout.pageRows(spark)
        println(s"""{"phase":"probecheck","store_rows":$storeRows,"probe_keys":$probeN,"probe_decoded":$decoded,"rows_per_key":$perKey,"pruned":$ok}""")
      case other => sys.error(s"unknown phase: $other")
    }
    spark.stop()
  }
}
