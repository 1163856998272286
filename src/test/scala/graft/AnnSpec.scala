package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ann.Knn

class AnnSpec extends AnyFunSuite with SparkFixture {

  private val dim = 64
  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("brute-force knn: ranks are by descending cosine, self excluded") {
    val res = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim, k = 5).cache()
    assert(res.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val bad = res.as("r").groupBy("query_id")
      .agg(min(col("sim")).as("mn"), max(col("sim")).as("mx"),
        count(lit(1)).as("n"))
      .filter(col("n") =!= 5 || col("mn") > col("mx"))
    assert(bad.count() == 0)
    // rank 1 must carry the max sim of the query's result set
    val r1 = res.filter(col("rk") === 1).select("query_id", "sim")
      .withColumnRenamed("sim", "top")
    val mx = res.groupBy("query_id").agg(max("sim").as("mx"))
    assert(r1.join(mx, "query_id").filter(col("top") =!= col("mx")).count() == 0)
  }

  test("mmr: first pick is the relevance argmax, later picks trade " +
      "relevance for diversity") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") === 0)
    val topk = Knn.bruteForceTopK(emb, q, "vec_id", "embedding", dim, k = 10)
      .select("neighbor_id").as[Long].collect().toSeq
    val mmr = Knn.mmrTopK(emb, q, "vec_id", "embedding", dim,
        k = 10, candK = 50, lambda = 0.7, oneMinusLambda = 0.3)
      .orderBy("rk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(mmr.length == 10)
    assert(mmr.map(_._2).distinct.length == 10, "picks must be distinct")
    // rank 1 IS the pure-relevance winner (redundancy term is empty)
    assert(mmr.head._2 == topk.head)
    // λ=1 degenerates to plain top-k: MMR's diversity term is the
    // ONLY thing that may change the picks
    val pure = Knn.mmrTopK(emb, q, "vec_id", "embedding", dim,
        k = 10, candK = 50, lambda = 1.0, oneMinusLambda = 0.0)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(pure == topk)
    // every MMR pick comes from the candidate pool
    val pool = Knn.bruteForceTopK(emb, q, "vec_id", "embedding", dim, k = 50)
      .select("neighbor_id").as[Long].collect().toSet
    assert(mmr.forall(m => pool.contains(m._2)))
    // greedy scores are non-increasing: a later pick can never beat
    // an earlier one (it was available then with no extra redundancy)
    assert(mmr.sliding(2).forall { case Array(a, b) => b._3 <= a._3 })
  }

  test("lsh near-dup pairs: exact precision, high recall vs the n^2 join") {
    import spark.implicits._
    // the fixture embeddings are near-random (max pairwise cosine
    // 0.48), so build a clustered corpus where near-dups exist: 150
    // bases + a perturbed copy of every third one (cosine ≈ 0.95+)
    val rnd = new scala.util.Random(42)
    val bases = Seq.tabulate(150)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = bases.zipWithIndex.collect { case ((id, v), i) if i % 3 == 0 =>
      (1000L + id, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val corpus = (bases ++ dups).toDF("vec_id", "embedding")
    val th = 0.9
    val exact = Knn.nearDupPairs(corpus, "vec_id", "embedding", dim, th)
      .select("a", "b").cache()
    val lsh = Knn.nearDupPairsLsh(corpus, "vec_id", "embedding", dim, th)
      .cache()
    // precision is exact by construction: every emitted pair is
    // verified, so lsh ⊆ exact
    assert(lsh.select("a", "b").exceptAll(exact).count() == 0)
    assert(lsh.filter(col("sim") < th).count() == 0)
    val nExact = exact.count()
    assert(nExact >= 40, s"fixture must contain near-dup pairs, got $nExact")
    val recall = lsh.count().toDouble / nExact
    assert(recall >= 0.8, s"recall $recall below 0.8 ($nExact exact pairs)")
  }

  test("semDedupScaled: k grows with n, precision exact, finds the " +
      "planted within-cluster dups the label form finds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 80 bases + a near-copy of each (cosine ≈ 0.97); k = n/target
    val bases = Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = bases.map { case (id, v) =>
      (1000L + id, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)) }
    val corpus = (bases ++ dups).toDF("vec_id", "embedding")
    val got = Knn.semDedupScaled(corpus, "vec_id", "embedding", dim,
      threshold = 0.9, targetClusterSize = 16).cache()
    // k = 160/16 = 10 clusters actually materialized
    assert(got.select("cluster").distinct().count() >= 5)
    // precision is exact by construction: every emitted (a, dup_of)
    // is cosine-verified at the threshold
    val exact = Knn.nearDupPairs(corpus, "vec_id", "embedding", dim, 0.9)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.select("vec_id", "dup_of").collect().foreach { r =>
      val p = (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))
      assert(exact.contains(p), s"emitted non-dup $p")
    }
    // recall: a planted near-copy collides with its base only if
    // k-means put them in one cell — which co-location at 0.97 cosine
    // makes overwhelmingly likely; require most survive
    val found = (0 until 80).count { i =>
      got.filter(col("vec_id") === (1000L + i) &&
        col("dup_of") === i.toLong).count() == 1 }
    assert(found >= 64, s"only $found/80 planted dups found")
  }

  test("semDedupScaled deeper-tree router: same precision/recall " +
      "pins as the two-level form when the tree engages") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bases = Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = bases.map { case (id, v) =>
      (1000L + id, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)) }
    val corpus = (bases ++ dups).toDF("vec_id", "embedding")
    // force the n·log k tree router at test scale (k = 10 > 4):
    // production default engages past 4096 centroids
    spark.conf.set("graft.semdedup.treeK", "4")
    val got = try Knn.semDedupScaled(corpus, "vec_id", "embedding", dim,
      threshold = 0.9, targetClusterSize = 16).cache()
    finally spark.conf.unset("graft.semdedup.treeK")
    // precision exact by construction (cosine-verified emissions)
    val exact = Knn.nearDupPairs(corpus, "vec_id", "embedding", dim, 0.9)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.select("vec_id", "dup_of").collect().foreach { r =>
      val p = (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))
      assert(exact.contains(p), s"emitted non-dup $p")
    }
    // recall: the beam-2 descent must co-route planted near-copies
    // (cosine ≈ 0.97) with their bases like the top-2 coarse probe
    val found = (0 until 80).count { i =>
      got.filter(col("vec_id") === (1000L + i) &&
        col("dup_of") === i.toLong).count() == 1 }
    assert(found >= 64, s"only $found/80 planted dups found under tree")
  }

  test("lsh bucket cap drops a degenerate region but keeps real " +
      "near-dup clusters (the 64x disk-exhaustion guard)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // a degenerate region: 1200 vectors all within a tiny cone (every
    // sign bucket they touch blows past the cap) + planted small
    // near-dup clusters far from it
    val cone = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val degen = Seq.tabulate(1200)(i => (10000L + i,
      cone.map(x => x + 0.01f * rnd.nextGaussian().toFloat)))
    val bases = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val dups = bases.map { case (id, v) =>
      (1000L + id, v.map(x => x + 0.03f * rnd.nextGaussian().toFloat)) }
    val corpus = (degen ++ bases ++ dups).toDF("vec_id", "embedding")
    val got = Knn.nearDupPairsLsh(corpus, "vec_id", "embedding", dim,
        threshold = 0.9, maxBucket = 200)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every small planted cluster is found (base i ~ dup 1000+i)...
    val found = (0 until 60).count(i => got.contains((i.toLong, 1000L + i)))
    assert(found >= 48, s"only $found/60 planted pairs survived the cap")
    // ...and the degenerate region's quadratic tail is NOT
    // enumerated: its ~719k all-pairs volume collapses to the few
    // pairs that reach via small boundary buckets (the cap bounds
    // candidate VOLUME, not membership — stragglers near a
    // hyperplane land in small side-buckets and may legally pair)
    val conePairs = got.count { case (a, b) => a >= 10000L && b >= 10000L }
    assert(conePairs < 36000,
      s"cap failed to collapse the degenerate region: $conePairs pairs " +
        "(unguarded would be ~719k)")
  }

  test("ivf knn: neighbors come from probed cells, recall beats single-cell") {
    import graft.ann.Ivf
    val model = Ivf.train(emb, "vec_id", "embedding", dim, k = 8, iters = 2)
    assert(model.centroids.size == 8)
    val queries = emb.filter(col("vec_id") < 20)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", dim, k = 5,
      model, nprobe = 3).cache()
    // every neighbor must live in one of the query's probed cells
    val cells = emb.select(col("vec_id").as("neighbor_id"),
      model.cellExpr(col("embedding")).as("ncell"))
    val probed = queries.select(col("vec_id").as("query_id"),
      model.probeCellsExpr(col("embedding"), 3).as("qcells"))
    val bad = ivf.join(cells, "neighbor_id").join(probed, "query_id")
      .filter(!array_contains(col("qcells"), col("ncell")))
    assert(bad.count() == 0)
    // recall@5 vs brute force, nprobe=3 of 8 cells: must find a
    // decent share (and strictly more than zero)
    val brute = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", dim, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall > 0.2, s"ivf recall@5 = $recall")
  }

  test("lsh knn: every neighbor shares the query's bucket and sims are exact") {
    val lsh = Knn.lshTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim, k = 5).cache()
    val withBuckets = emb.select(col("vec_id"),
      Knn.lshBucket(col("embedding"), dim, 8).as("bucket"))
    val joined = lsh
      .join(withBuckets.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("bucket", "qb"), "query_id")
      .join(withBuckets.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("bucket", "nb"), "neighbor_id")
    assert(joined.filter(col("qb") =!= col("nb")).count() == 0)
    // sims agree with an independent brute-force computation
    val brute = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim, k = 500)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val cmp = lsh.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-12)
    assert(cmp.count() == 0)
  }

  test("centroid assignment labels each vector with its nearest label mean") {
    import spark.implicits._
    // two well-separated clusters on axes: label 0 near e1, label 1
    // near e2, plus one vector planted between but closer to e2
    def v(xs: Float*) = xs.toArray
    val df = Seq(
      (0L, v(1f, 0.1f, 0f), 0), (1L, v(0.9f, 0f, 0.1f), 0),
      (2L, v(0.1f, 1f, 0f), 1), (3L, v(0f, 0.9f, 0.1f), 1),
      (4L, v(0.2f, 0.8f, 0f), 0)) // mislabeled on purpose
      .toDF("vec_id", "embedding", "label")
    val got = Knn.centroidAssign(df, "vec_id", "embedding", "label", dim = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(0L) == 0 && got(1L) == 0)
    assert(got(2L) == 1 && got(3L) == 1)
    // the planted vector is reassigned toward the cluster it's near —
    // but its own (wrong) label pulled centroid 0 toward e2, so just
    // assert it lands with the e2-dominant centroid
    assert(got(4L) == 1)
    // output is exactly one row per vector
    assert(Knn.centroidAssign(df, "vec_id", "embedding", "label", 3)
      .groupBy("vec_id").count().filter(col("count") =!= 1).count() == 0)
  }

  test("pq knn: exact re-ranked sims, recall tracks brute force") {
    val model = graft.ann.Pq.train(emb, "vec_id", "embedding", dim,
      m = 4, k = 16)
    // every subspace codebook is complete and the right width
    assert(model.codebooks.size == 4)
    assert(model.codebooks.forall(cb => cb.size == 16 &&
      cb.forall(_._2.size == 16)))
    val pq = graft.ann.Pq.topK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", dim, k = 5, model).cache()
    // one row per (query, rank), ranks 1..5, self excluded
    assert(pq.count() == 50)
    assert(pq.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // reported sims are EXACT cosines (the re-rank contract): agree
    // with an independent brute-force computation wherever both rank
    val brute = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", dim, k = 500)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    assert(pq.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-12).count() == 0)
    // recall@5 vs brute: ADC over 4×16 codes + exact re-rank of 32
    val b5 = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got5 = pq.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got5 & b5).size.toDouble / b5.size
    assert(recall >= 0.5, s"pq recall@5 = $recall")
  }

  test("ivf×pq: neighbors from probed cells, exact re-ranked sims, recall") {
    import graft.ann.{Ivf, Pq}
    val ivf = Ivf.train(emb, "vec_id", "embedding", dim, k = 8, iters = 2)
    val pq = Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 16)
    val queries = emb.filter(col("vec_id") < 10)
    val got = Pq.topKWithIvf(emb, queries, "vec_id", "embedding", dim,
      k = 5, pq, ivf, nprobe = 3).cache()
    assert(got.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // cell containment: every neighbor lives in a probed cell
    val cells = emb.select(col("vec_id").as("neighbor_id"),
      ivf.cellExpr(col("embedding")).as("ncell"))
    val probed = queries.select(col("vec_id").as("query_id"),
      ivf.probeCellsExpr(col("embedding"), 3).as("qcells"))
    assert(got.join(cells, "neighbor_id").join(probed, "query_id")
      .filter(!array_contains(col("qcells"), col("ncell"))).count() == 0)
    // sims are exact cosines (re-rank contract)
    val brute = Knn.bruteForceTopK(emb, queries,
        "vec_id", "embedding", dim, k = 500)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    assert(got.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-12).count() == 0)
    // recall@5: the composition can only lose candidates IVF prunes,
    // so it tracks brute at the nprobe recall level
    val b5 = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding",
        dim, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val g5 = got.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (g5 & b5).size.toDouble / b5.size
    assert(recall >= 0.2, s"ivf×pq recall@5 = $recall")
  }

  test("sq knn: exact re-ranked sims, near-brute recall, code range") {
    import graft.ann.Sq
    val queries = emb.filter(col("vec_id") < 10)
    val got = Sq.topK(emb, queries, "vec_id", "embedding", dim,
      k = 5).cache()
    assert(got.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // signed codes stay within the ±127 grid of a unit vector
    val codes = emb.select(explode(Sq.codeExpr(col("embedding"), dim))
      .as("c")).agg(min("c"), max("c")).head()
    assert(codes.getInt(0) >= -127 && codes.getInt(1) <= 127)
    // re-ranked sims are exact cosines
    val brute = Knn.bruteForceTopK(emb, queries,
        "vec_id", "embedding", dim, k = 500)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    assert(got.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-12).count() == 0)
    // 8-bit scalar quantization barely dents recall (the SQ8 selling
    // point) — far above PQ's 4x16 codebook at the same rerankK
    val b5 = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding",
        dim, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val g5 = got.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (g5 & b5).size.toDouble / b5.size
    assert(recall >= 0.8, s"sq recall@5 = $recall")
  }

  test("trainCached: one training per (plan, geometry), cleared by the " +
      "derived-memo reset (r12 — ivf/pq/ivfpq shared the training)") {
    graft.util.Memos.resetDerived()
    // fresh frames over the same source — instance identity differs,
    // the plan's semantic hash does not
    val a = ann.Ivf.trainCached(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", dim, k = 8)
    val b = ann.Ivf.trainCached(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", dim, k = 8)
    assert(a eq b, "second call must be a memo hit")
    val pa = ann.Pq.trainCached(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", dim, m = 4, k = 8)
    val pb = ann.Pq.trainCached(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", dim, m = 4, k = 8)
    assert(pa eq pb, "second call must be a memo hit")
    // different geometry ⇒ different model
    val c = ann.Ivf.trainCached(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", dim, k = 4)
    assert(!(a eq c))
    // the bench's between-pass reset re-trains (no cross-pass reuse)
    graft.util.Memos.resetDerived()
    val d = ann.Ivf.trainCached(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding", dim, k = 8)
    assert(!(a eq d), "reset must clear the model memo")
    // and the deterministic retrain reproduces the same centroids
    assert(a.centroids == d.centroids)
  }
}
