package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.Algorithms
import graft.text.{Packing, Retrieval}

class RetrievalSpec extends AnyFunSuite with SparkFixture {

  test("bm25 ranks the term-dense short doc above padded ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark join"),
      (2L, "spark pad pad pad pad pad pad pad pad pad pad pad"),
      (3L, "pad pad pad pad"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25(df, "doc_id", "text",
      Seq("spark", "join"), k = 3).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // doc 3 has no query term at all → score exactly 0
    assert(got.last.getDouble(1) == 0.0)
  }

  test("unigram perplexity: all-common-token doc scores lower than rare-token doc") {
    import spark.implicits._
    // 'common' appears 12x in the corpus, 'rare' tokens once each
    val df = Seq(
      (1L, "common common common common common common"),
      (2L, "common common common common common common"),
      (3L, "rare1 rare2 rare3 rare4"))
      .toDF("doc_id", "text")
    val got = Retrieval.unigramPerplexity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == got(2L))
    assert(got(3L) > got(1L))
    // perplexity of a uniform-unigram doc = vocabulary "surprise":
    // p(common) = 12/16, ppl = 16/12 exactly
    assert(math.abs(got(1L) - 16.0 / 12.0) < 1e-3)
  }

  test("greedy packing: bins respect the budget and reset per group") {
    import spark.implicits._
    val mk = (id: Long, src: String, n: Int) =>
      (id, src, Seq.fill(n)("t").mkString(" "))
    val df = Seq(
      mk(1, "a", 100), mk(2, "a", 100), mk(3, "a", 100), // bin0: 200, bin1: 100
      mk(4, "a", 300), // oversize → its own bin (bin1 had 100+300>256)
      mk(5, "b", 10)   // new group → bin 0
    ).toDF("doc_id", "source", "text")
    val got = Packing.packGreedy(df, "doc_id", "text", "source", budget = 256)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 0L))
  }

  test("greedy packing invariants on the real corpus") {
    val packed = Packing.packGreedy(Tables.documents(spark, sfDir),
      "doc_id", "text", "source", budget = 256)
    val bins = packed.groupBy("source", "bin")
      .agg(sum("n_toks").as("tot"), count(lit(1)).as("n_docs"))
    // a bin only exceeds the budget when it holds a single oversize doc
    assert(bins.filter(col("tot") > 256 && col("n_docs") > 1).count() == 0)
    // bin ids are contiguous from 0 within each group
    val gaps = bins.groupBy("source")
      .agg(max("bin").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1)
    assert(gaps.count() == 0)
  }

  test("shard assignment is deterministic, total-preserving, and the " +
      "partitioned write round-trips with a matching manifest") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val stats = Packing.shardStats(docs, "doc_id", "text", nShards = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every shard populated; totals preserved; recompute identical
    assert(stats.keySet == (0L until 8L).toSet)
    assert(stats.values.map(_._1).sum == docs.count())
    val again = Packing.shardStats(docs, "doc_id", "text", nShards = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == stats)

    val out = java.nio.file.Files.createTempDirectory("shards").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Packing.writeShards(docs, "doc_id", "text", nShards = 8, out)
    // partition pruning: one shard dir read touches only its rows
    val s3 = spark.read.parquet(out).filter(col("shard") === 3)
    assert(s3.count() == stats(3L)._1)
    assert(s3.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(shard"), "prune on shard")
    // round-trip: union of shards == corpus; manifest == stats
    assert(spark.read.parquet(out).count() == docs.count())
    val manifest = spark.read.parquet(s"$out/_manifest")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(manifest == stats)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("adamic-adar scores the strongly co-linked pair highest and excludes adjacent pairs") {
    import spark.implicits._
    // x and y share hubs h1, h2; x and z share only h1; y–z adjacent
    val edges = Seq(
      ("x", "h1"), ("x", "h2"), ("y", "h1"), ("y", "h2"),
      ("z", "h1"), ("y", "z"), ("h1", "q"), ("h2", "q2"))
      .toDF("a", "b")
    val und = graft.graph.GraphBuilder.undirected(
      edges.select(col("a").as("src_key"), col("b").as("dst_key")))
    val got = Algorithms.adamicAdar(und, Seq("x"), perSeed = 10)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    // y via {h1 (deg 4), h2 (deg 3)}, z via {h1} only
    assert(got("y") > got("z"))
    assert(math.abs(got("y") - (1 / math.log(4) + 1 / math.log(3))) < 1e-3)
    // x itself never appears; adjacent candidates excluded for seed y
    assert(!got.contains("x"))
    val fromY = Algorithms.adamicAdar(und, Seq("y"), perSeed = 10)
      .collect().map(_.getString(1)).toSet
    assert(!fromY.contains("z")) // adjacent
  }

  test("hybrid rrf fuses the bm25 and cosine lists by rank") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val terms = Seq("spark", "join", "stream")
    val fused = Retrieval.hybridRrf(docs, emb, "doc_id", "text",
      "vec_id", "embedding", 64, terms, queryVecId = 0L, k = 25)
      .collect()
    assert(fused.length == 25)
    // rrf is exactly the sum of the reciprocal-rank terms it reports
    fused.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("rk_lex"))
        .map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      val sem = Option(r.getAs[java.lang.Long]("rk_sem"))
        .map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") -
        math.rint((lex + sem) * 1e6) / 1e6) < 1e-9)
      assert(r.getAs[java.lang.Long]("rk_lex") != null ||
        r.getAs[java.lang.Long]("rk_sem") != null)
    }
    // descending fused score, ties by id ascending
    val scores = fused.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("id")))
    assert(scores.sameElements(scores.sorted))
    // a doc in BOTH lists must outrank one with only the same single-
    // list rank: rank-1-in-both beats everything with one list only
    val both = fused.filter(r => r.getAs[java.lang.Long]("rk_lex") != null &&
      r.getAs[java.lang.Long]("rk_sem") != null)
    if (both.nonEmpty)
      assert(fused.head.getAs[Double]("rrf") >= both.map(_.getAs[Double]("rrf")).max)
  }
}
