package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The fused one-pass curation operator: every output column equals
  * its standalone operator bit-for-bit, and the fusion claim is a
  * plan property — one corpus scan, one exchange — not prose. */
class CurationSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs =
    Tables.documents(spark, sfDir).select("doc_id", "text").localCheckpoint()
  private lazy val fused =
    TextAnalysis.curate(docs, "doc_id", "text").localCheckpoint()

  private def keyed(df: org.apache.spark.sql.DataFrame,
      cols: String*): Map[Long, Seq[Any]] =
    df.select(col("doc_id") +: cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

  test("fused quality features equal TextAnalysis.quality") {
    val want = keyed(TextAnalysis.quality(docs, "doc_id", "text"),
      "n_chars", "n_tokens", "avg_token_len", "stopword_ratio")
    val got = keyed(fused.withColumn("n_tokens", col("n_tokens").cast("int")),
      "n_chars", "n_tokens", "avg_token_len", "stopword_ratio")
    assert(got == want)
  }

  test("fused gate equals gopherRules.keep; langid and split equal theirs") {
    val gopher = keyed(TextAnalysis.gopherRules(docs, "doc_id", "text"), "keep")
    assert(keyed(fused, "quality_keep") == gopher)
    val lang = keyed(TextAnalysis.langId(docs, "doc_id", "text"), "pred_lang")
    assert(keyed(fused, "pred_lang") == lang)
    val split = keyed(docs.select(col("doc_id"),
      TextAnalysis.assignSplit(col("doc_id")).as("split")), "split")
    assert(keyed(fused, "split") == split)
  }

  test("fused dedup columns equal exactGroups; keep composes the three") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val withFp = docs.select(col("doc_id"),
        Dedup.bowFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    fused.select("doc_id", "keeper", "n_copies").collect().foreach {
      case Row(id: Long, keeper: Long, n: Long) =>
        val (nc, kp) = (groups(withFp(id))._1, groups(withFp(id))._2)
        assert(n == nc && keeper == kp, s"doc $id")
    }
    fused.select("doc_id", "quality_keep", "pred_lang", "keeper", "keep")
      .collect().foreach { case Row(id: Long, q: Boolean, l: String,
          kp: Long, k: Boolean) =>
        assert(k == (q && l == "en" && id == kp), s"doc $id")
      }
    // the gate keeps a nonempty, strict subset at this corpus
    val kept = fused.filter(col("keep")).count()
    assert(kept > 0 && kept < fused.count())
  }

  test("tokenDrift flags planted train-only and val-only tokens, " +
      "not the shared vocabulary") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("doc_id")
    val splits = ids.select(col("doc_id"),
        TextAnalysis.assignSplit(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = splits.toSeq.map { case (id, sp) =>
      val marker = if (sp == "train") "aaa" else if (sp == "val") "bbb"
        else "ccc"
      (id, s"$marker common common common")
    }.toDF("doc_id", "text")
    val drift = TextAnalysis.tokenDrift(docs, "doc_id", "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(5), r.getBoolean(6))).toMap
    assert(drift("aaa")._2, "train-only token must flag as drifted")
    assert(drift("bbb")._2 && drift("bbb")._1 < 1.0,
      "val-only token must flag as drifted low")
    assert(!drift("common")._2, "shared token must not flag")
    assert(!drift.contains("ccc"), "test-split tokens are excluded")
    // the top-K cut is TakeOrderedAndProject (bounded heaps), never a
    // full vocabulary sort
    val p = TextAnalysis.tokenDrift(
        Tables.documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("the library composes end-to-end: curate → near-dup clusters → " +
      "drift → pack → shards, invariants hold at every stage") {
    val kept = docs.join(fused.filter(col("keep")).select("doc_id"),
      "doc_id").localCheckpoint()
    val nKept = kept.count()
    assert(nKept > 0 && nKept < docs.count(),
      "curation must keep a nonempty strict subset")
    // curate's keep removed exact dups; the MinHash pass catches the
    // NEAR-dups that survive it, transitively clustered
    val pairs = Dedup.minhashNearDups(kept, "doc_id", "text",
      threshold = 0.8)
    val kc = Dedup.resolveClusters(pairs).columns
    val drop = Dedup.resolveClusters(pairs)
      .filter(col(kc(0)) =!= col(kc(1)))
      .select(col(kc(0)).as("doc_id"))
    val deduped = kept.join(drop, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    assert(deduped.count() < nKept,
      "the corpus's planted near-dups must survive curation and be " +
        "removed here")
    // distribution check on what a trainer would actually see
    val drift = graft.text.TextAnalysis.tokenDrift(
      deduped, "doc_id", "text", topK = 50)
    assert(drift.count() > 0)
    // context-window packing per split: every surviving doc lands in
    // exactly one bin
    val withSplit = deduped.select(col("doc_id"), col("text"),
      graft.text.TextAnalysis.assignSplit(col("doc_id")).as("split"))
    val packed = graft.text.Packing.packGreedy(withSplit,
      "doc_id", "text", "split", budget = 256)
    assert(packed.count() == deduped.count())
    // shard write: the manifest accounts for every packed doc
    val out = java.nio.file.Files.createTempDirectory("pipe-shards")
      .toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    graft.text.Packing.writeShards(deduped, "doc_id", "text", 4, out)
    val manifest = spark.read.parquet(s"$out/_manifest")
    assert(manifest.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .collect()(0).getLong(0) == deduped.count())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("the fusion IS the plan: one corpus scan, one exchange") {
    val p = TextAnalysis.curate(
        Tables.documents(spark, sfDir).select("doc_id", "text"),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    // while the naive composition of the same five operators scans
    // the corpus five times (the cost fusing exists to remove)
    val naive = TextAnalysis.quality(
        Tables.documents(spark, sfDir), "doc_id", "text")
      .join(TextAnalysis.langId(
        Tables.documents(spark, sfDir), "doc_id", "text"), "doc_id")
      .join(TextAnalysis.gopherRules(
          Tables.documents(spark, sfDir), "doc_id", "text")
        .select("doc_id", "keep"), "doc_id")
      .join(Tables.documents(spark, sfDir).select(col("doc_id"),
        Dedup.bowFingerprint(col("text")).as("fp")), "doc_id")
      .join(Dedup.exactGroups(
        Tables.documents(spark, sfDir), "doc_id", "text"), "fp")
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(naive).size == 5)
  }
}
