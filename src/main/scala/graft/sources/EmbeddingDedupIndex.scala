package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.functions.Registry

/** The EMBEDDING twin of [[DedupIndex]]: an incremental near-dup
  * index over vectors — each new batch is cosine-near-dup checked
  * against everything ingested so far without re-scanning the
  * corpus, then committed as an O(batch) segment (sign-LSH band
  * rows + the vectors themselves for verification). Same protocol,
  * same soundness argument: the sign-LSH bucket of a vector is
  * map-side pure (independent of the rest of the corpus), so
  * new×store catches cross-batch pairs, new×new catches same-batch
  * pairs, and the union over updates equals the bulk banded pipeline
  * over the whole corpus — pinned in EmbeddingDedupIndexSpec.
  *
  * Store layout (segment log, `_SUCCESS`-gated, [[ShadowLog]]
  * conventions):
  * {{{
  *   root/
  *     _meta.json             (threshold + LSH geometry, written once)
  *     seg-<ts>-<seq>/
  *       _SUCCESS             (commit marker, written LAST)
  *       bands/               (band, bucket, id parquet)
  *       vecs/                (id, v, nm parquet)
  * }}}
  *
  * Geometry note: the BULK path (`Knn.nearDupPairsLsh`) scales its
  * bits with n and caps oversized buckets; an incremental store must
  * pin geometry at creation (signatures across segments must agree),
  * so `bits` here is an explicit knob — size it for the corpus you
  * expect (log2(expected_n/256)), and rebuild the index to re-band,
  * exactly like re-sharding any hash layout.
  */
object EmbeddingDedupIndex {

  case class Meta(threshold: Double, bands: Int, bits: Int,
      maxBucket: Int)

  case class UpdateResult(segment: String, pairs: DataFrame)

  /** Near-dup-check `newVecs` against the store AND itself, then
    * commit the batch as a new segment. Returns (a, b, sim) pairs,
    * canonically a < b, every pair cosine-verified at `threshold`.
    * `segmentName` pins identity for replayed streaming batches —
    * the named segment is dropped before the store is read, same
    * contract as [[DedupIndex.update]]. Ids already in the store are
    * dropped (first write wins). */
  def update(spark: SparkSession, root: String, newVecs: DataFrame,
      idCol: String, vecCol: String, dim: Int, threshold: Double,
      bands: Int = 10, bits: Int = 6, maxBucket: Int = 500,
      segmentName: Option[String] = None): UpdateResult = {
    Registry.registerAll(spark)
    // loud bounds: bits > 63 silently wraps the bucket bit shift and
    // bits <= 0 degenerates every vector into one bucket — and a bad
    // geometry would be pinned in _meta.json forever
    require(bits > 0 && bits <= 32, s"bits must be in [1, 32]: $bits")
    require(bands > 0 && maxBucket > 0,
      s"bands/maxBucket must be positive: $bands/$maxBucket")
    val meta = readOrInitMeta(spark, root,
      Meta(threshold, bands, bits, maxBucket))
    require(meta == Meta(threshold, bands, bits, maxBucket),
      s"index at $root was built with $meta; updates must match " +
        s"(got threshold=$threshold bands=$bands bits=$bits " +
        s"maxBucket=$maxBucket)")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    segmentName.foreach { s =>
      require(s.startsWith("seg-"), s"segment name must start with seg-: $s")
      val sp = new Path(root, s)
      if (fs.exists(sp)) fs.delete(sp, true)
    }
    val segs = segments(spark, root)

    val rawBase = newVecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(Knn.dot(col(vecCol), col(vecCol))).as("nm"))
    // first write wins — replays and at-least-once sources converge
    // exactly one row per id even WITHIN a batch: an at-least-once
    // source can redeliver inside one micro-batch, and the append-only
    // log could never retract the double row
    val base = (if (segs.isEmpty) rawBase.dropDuplicates("id")
      else rawBase.dropDuplicates("id")
        .join(readSegs(spark, root, segs, "vecs",
          "id BIGINT, v ARRAY<FLOAT>, nm DOUBLE").select(col("id")),
        Seq("id"), "left_anti")).localCheckpoint()

    // banding materialized once: candOld, both candNew sides and the
    // segment write all read it (bands x bits dot products per row —
    // the bulk path checkpoints its banded frame for the same reason)
    val newBands = base.select(col("id"), posexplode(array(
        (0 until bands).map(j =>
          Knn.lshBucketSeeded(col("v"), dim, bits, seed = j)): _*))
      .as(Seq("band", "bucket"))).localCheckpoint()
    val storeBands = if (segs.isEmpty) newBands.limit(0)
      else readSegs(spark, root, segs, "bands",
        "band INT, bucket BIGINT, id BIGINT")
    val storeVecs = if (segs.isEmpty) base.limit(0).select("id", "v", "nm")
      else readSegs(spark, root, segs, "vecs",
        "id BIGINT, v ARRAY<FLOAT>, nm DOUBLE")

    // the bulk path's oversized-bucket guard, incremental form: a
    // bucket whose STORE+BATCH population exceeds maxBucket is
    // dropped from candidate generation (hyperplane non-
    // discrimination, not similarity — its quadratic tail would
    // otherwise grow with the store and reproduce the 64x disk
    // death); maxBucket is index geometry, pinned in _meta.json
    val okBuckets = newBands.unionByName(storeBands)
      .groupBy("band", "bucket").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBucket).drop("__sz")
    val newB = newBands.join(broadcast(okBuckets), Seq("band", "bucket"))
    val storeB = storeBands.join(broadcast(okBuckets), Seq("band", "bucket"))

    val candOld = newB.as("x").join(storeB.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"))
    val candNew = newB.as("x").join(newB.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val allVecs = storeVecs.unionByName(base.select("id", "v", "nm"))
    val pairs = candOld.unionByName(candNew).distinct()
      .join(allVecs.select(col("id").as("a"), col("v").as("va"),
        col("nm").as("na")), "a")
      .join(allVecs.select(col("id").as("b"), col("v").as("vb"),
        col("nm").as("nb")), "b")
      .select(col("a"), col("b"),
        (Knn.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      // NaN guard: a zero-norm vector (padded/failed encoder row)
      // yields 0/0 = NaN, and Spark orders NaN above every double, so
      // an unguarded >= would assert similarity for it
      .filter(!isnan(col("sim")) && col("sim") >= threshold)
      .localCheckpoint()

    val seg = segmentName.getOrElse(f"seg-${System.currentTimeMillis()}%013d-${
      saveSeq.incrementAndGet()}%04d")
    newBands.write.parquet(s"$root/$seg/bands")
    base.select("id", "v", "nm").write.parquet(s"$root/$seg/vecs")
    fs.create(new Path(root, s"$seg/_SUCCESS"), true).close()
    UpdateResult(seg, pairs)
  }

  def currentVecs(spark: SparkSession, root: String): DataFrame =
    readSegs(spark, root, segments(spark, root), "vecs",
      "id BIGINT, v ARRAY<FLOAT>, nm DOUBLE")

  def segments(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ShadowLog.list(fs, p, "_SUCCESS", _.startsWith("seg-"))._1
  }

  private def readSegs(spark: SparkSession, root: String,
      segs: Seq[String], table: String, emptyDdl: String): DataFrame =
    segs match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(emptyDdl))
      case ss => spark.read.parquet(ss.map(s => s"$root/$s/$table"): _*)
    }

  private def readOrInitMeta(spark: SparkSession, root: String,
      init: Meta): Meta = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val mp = new Path(root, "_meta.json")
    if (fs.exists(mp)) {
      val in = fs.open(mp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val m = """\{"threshold":([0-9.eE+-]+),"bands":(\d+),"bits":(\d+),"maxBucket":(\d+)\}"""
        .r.findFirstMatchIn(txt.trim)
        .getOrElse(throw new IllegalStateException(
          s"unreadable embedding-dedup-index meta at $mp: $txt"))
      Meta(m.group(1).toDouble, m.group(2).toInt, m.group(3).toInt,
        m.group(4).toInt)
    } else {
      fs.mkdirs(new Path(root))
      val out = fs.create(mp, false)
      try out.write(
        s"""{"threshold":${init.threshold},"bands":${init.bands},"bits":${init.bits},"maxBucket":${init.maxBucket}}"""
          .getBytes("UTF-8"))
      finally out.close()
      init
    }
  }

  private val saveSeq = new java.util.concurrent.atomic.AtomicLong()
}
