package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Compaction, ZOrderLayout}

class LayoutSpec extends AnyFunSuite with SparkFixture {

  test("compaction: shredded table rewritten to planned file count, " +
      "content identical, source untouched") {
    import scala.reflect.io.Directory
    val src = "/tmp/graft-test-compact-src"
    val out = "/tmp/graft-test-compact-out"
    new Directory(new java.io.File(src)).deleteRecursively()
    new Directory(new java.io.File(out)).deleteRecursively()
    // 40-way shredded write: the streaming-ingest pathology
    spark.range(0, 40000).selectExpr("id", "id * 7 AS v")
      .repartition(40).write.parquet(src)
    val before = Compaction.plan(spark, src, targetBytes = 1L << 40)
    assert(before.nFiles == 40 && before.nOut == 1,
      s"plan saw $before")
    // target sized to the measured bytes → asks for exactly 2 files
    val pl = Compaction.compact(spark, src, out,
      targetBytes = (before.nBytes + 1) / 2)
    assert(pl.nOut == 2)
    val after = Compaction.plan(spark, out, targetBytes = 1L << 40)
    assert(after.nFiles == 2, s"after=$after")
    assert(after.nBytes > 0 && after.nBytes < before.nBytes,
      "2 files must carry less footer/dictionary overhead than 40")
    // content identical, source intact
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(out)
    assert(a.count() == 40000 && b.count() == 40000)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("morton interleave: hand-computed codes, codegen built-ins only") {
    import spark.implicits._
    // (x=0b10, y=0b11, 2 bits) → y1 x1 y0 x0 = 1 1 1 0 = 14
    val df = Seq((2L, 3L), (0L, 0L), (3L, 3L)).toDF("x", "y")
      .select(ZOrderLayout.interleave(Seq(col("x"), col("y")), 2).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(14L, 0L, 15L))
    // quantize: envelope endpoints land on 0 and 2^bits−1; constant
    // envelope degenerates to 0 instead of dividing by zero
    val q = Seq(0.0, 5.0, 10.0).toDF("v")
      .select(ZOrderLayout.quantize(col("v"), 0.0, 10.0, 4).as("q"))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L, 7L, 15L))
    val qc = Seq(3.0).toDF("v")
      .select(ZOrderLayout.quantize(col("v"), 3.0, 3.0, 4).as("q"))
    assert(qc.head().getLong(0) == 0L)
  }

  test("incremental agg: two batch folds equal one full recompute, " +
      "prior version survives as rollback") {
    import scala.reflect.io.Directory
    import graft.sources.IncrementalAgg
    val root = "/tmp/graft-test-incragg"
    new Directory(new java.io.File(root)).deleteRecursively()
    val docs = Tables.documents(spark, sfDir)
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    // same-millisecond updates are safe: the version name carries a
    // monotone sequence suffix (no sleep workaround needed)
    IncrementalAgg.updateTokenCounts(spark, root, b1)
    IncrementalAgg.updateTokenCounts(spark, root, b2)
    val incr = IncrementalAgg.currentTokenCounts(spark, root)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs
      .select(explode(graft.text.TextAnalysis.wsTokens(col("text")))
        .as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(incr == full, "incremental state diverged from recompute")
    // both versions committed; the older one is intact rollback state
    val vs = new java.io.File(root).list().filter(_.startsWith("v")).sorted
    assert(vs.length == 2)
    val v0 = spark.read.parquet(s"$root/${vs.head}")
      .agg(sum("n")).head().getLong(0)
    val b1Tokens = b1.select(explode(
      graft.text.TextAnalysis.wsTokens(col("text")))).count()
    assert(v0 == b1Tokens, "first version no longer matches batch 1")
  }

  test("z-ordered layout localizes both dimensions; linear does not") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"), col("value"))
    val nFiles = 16
    val zPath = "/tmp/graft-test-zorder"
    val tPath = "/tmp/graft-test-timesorted"
    ZOrderLayout.write(ev, Seq("user_id", "tus"), zPath, nFiles)
    // the comparison layout: the usual time-sorted table
    ev.repartitionByRange(nFiles, col("tus"))
      .sortWithinPartitions("tus")
      .write.mode("overwrite").parquet(tPath)
    val bounds = ev.agg(min("user_id"), max("user_id"),
      min("tus"), max("tus")).head()
    val (uLo, uHi) = (bounds.getLong(0), bounds.getLong(1))
    val (tLo, tHi) = (bounds.getLong(2), bounds.getLong(3))
    // ~12% band in each dimension
    val uBand = col("user_id").between(uLo, uLo + (uHi - uLo) / 8)
    val tBand = col("tus").between(tLo, tLo + (tHi - tLo) / 8)
    def files(path: String, pred: org.apache.spark.sql.Column) =
      ZOrderLayout.filesTouched(spark, path, pred)
    // user-band query: the time-sorted layout scatters every user
    // across all files; the z-order curve keeps the band local
    val zU = files(zPath, uBand)
    val tU = files(tPath, uBand)
    assert(tU >= nFiles - 1, s"time layout should touch ~all files, got $tU")
    assert(zU * 2 <= tU, s"z-order should halve the user-band files: $zU vs $tU")
    // time-band query: z-order keeps time locality too (within 2× of
    // the dedicated time layout, the price of serving both dims)
    val zT = files(zPath, tBand)
    val tT = files(tPath, tBand)
    assert(zT <= tT * 2 + 2, s"z-order time-band blowup: $zT vs $tT")
    assert(zT < nFiles, s"z-order should still prune the time band, got $zT")
    // box query (both bands): few files either way, z at least as good
    val zBox = files(zPath, uBand && tBand)
    assert(zBox <= zU && zBox <= zT + 1, s"box should refine: $zBox")
    // layout is a pure reorder: same rows, same schema
    assert(spark.read.parquet(zPath).count() == ev.count())
  }
}
