package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Algorithms, GraphBuilder, Traversal}

class GraphSpec extends AnyFunSuite with SparkFixture {

  private def und(pairs: (String, String)*) = {
    import spark.implicits._
    val e = pairs.toDF("src_key", "dst_key")
    GraphBuilder.undirected(e)
  }

  test("node ids are distinct xxhash64 values keyed by key_data") {
    val n = GraphBuilder.nodes(spark, sfDir)
    assert(n.count() == n.select("id").distinct().count())
    val one = n.filter(col("key_data") === "c:1")
      .select(col("id") === xxhash64(col("key_data"))).head().getBoolean(0)
    assert(one)
  }

  test("connected components on a two-component graph") {
    val cc = Algorithms.connectedComponents(und("a" -> "b", "b" -> "c", "d" -> "e"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d", "e" -> "d"))
  }

  test("bfs levels gives min depth") {
    val lv = Traversal.bfsLevels(und("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d"),
        Seq("a"), 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(lv == Map("a" -> 0, "b" -> 1, "d" -> 1, "c" -> 2))
  }

  test("pathBetween returns a valid edge path on real data") {
    val edges = GraphBuilder.undirected(GraphBuilder.edges(spark, sfDir))
      .cache()
    val path = Traversal.pathBetween(edges, "c:1", "s:5")
      .orderBy("step").collect().map(_.getString(1))
    assert(path.head == "c:1" && path.last == "s:5")
    val pairs = path.sliding(2).map(p => (p(0), p(1))).toSeq
    val valid = pairs.forall { case (a, b) =>
      edges.filter(col("a") === a && col("b") === b).count() == 1 }
    assert(valid, s"non-edge step in ${path.mkString("->")}")
  }

  test("k-core assigns exact core numbers on a known graph") {
    // 4-clique {a,b,c,d} → core 3; triangle {e,f,g} → core 2 with a
    // pendant h on g → core 1; bridge d-e ties the components without
    // changing any core number
    val cores = Algorithms.kCore(und(
        "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d",
        "c" -> "d",
        "e" -> "f", "f" -> "g", "e" -> "g", "g" -> "h",
        "d" -> "e"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cores == Map(
      "a" -> 3, "b" -> 3, "c" -> 3, "d" -> 3,
      "e" -> 2, "f" -> 2, "g" -> 2, "h" -> 1))
    // a pure ring is everywhere 2-core
    val ring = Algorithms.kCore(und(
        "r1" -> "r2", "r2" -> "r3", "r3" -> "r4", "r4" -> "r1"))
      .collect().map(r => r.getInt(1)).toSet
    assert(ring == Set(2))
  }

  test("k-core regimes agree: single-task peeling == h-index rounds") {
    def g = und(
      "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d",
      "c" -> "d",
      "e" -> "f", "f" -> "g", "e" -> "g", "g" -> "h",
      "d" -> "e")
    val peel = Algorithms.kCore(g)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    spark.conf.set("graft.kcore.broadcastEdges", "0")
    val rounds =
      try Algorithms.kCore(g)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      finally spark.conf.unset("graft.kcore.broadcastEdges")
    assert(peel == rounds, s"$peel vs $rounds")
  }

  test("k-core is bounded by degree on real data") {
    val edges = GraphBuilder.undirected(GraphBuilder.edges(spark, sfDir))
      .localCheckpoint()
    val deg = edges.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
    val bad = Algorithms.kCore(edges).join(deg, "node")
      .filter(col("core") > col("deg") || col("core") < 1)
    assert(bad.count() == 0)
  }

  test("triangle count on known graphs") {
    def n(e: org.apache.spark.sql.DataFrame) =
      Algorithms.triangleCount(e).head().getLong(0)
    assert(n(und("a" -> "b", "b" -> "c", "a" -> "c")) == 1)
    assert(n(und("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d")) == 1)
    assert(n(und("a" -> "b", "b" -> "c")) == 0)
    // canonical one-direction list (no symmetrized rows) counts too
    import spark.implicits._
    val canonical = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("a", "b")
    assert(n(canonical) == 1)
  }

  test("assortativity: -1 on a star, disassortative on the hub-heavy " +
      "demo graph") {
    // K1,n is the textbook maximally disassortative graph: every edge
    // joins the hub (deg n) to a leaf (deg 1) → r = −1 exactly, and
    // the integer sufficient statistics make it EXACTLY −1 here too
    val star = und("hub" -> "x1", "hub" -> "x2", "hub" -> "x3")
    val r = Algorithms.assortativity(star).head()
    assert(r.getLong(0) == 6) // 3 undirected edges, both directions
    assert(r.getDouble(1) == -1.0)
    // real data: bipartite customer–supplier with high-degree
    // suppliers — must come out negative and in range
    val real = Algorithms.assortativity(
      GraphBuilder.undirectedFor(spark, sfDir)).head()
    val rr = real.getDouble(1)
    assert(rr >= -1.0 && rr <= 1.0 && rr < 0.0, s"r=$rr")
  }

  test("butterflies: K2,2 has exactly one, side-independent counts") {
    import spark.implicits._
    // c1,c2 × s1,s2 fully connected = the minimal butterfly; plus a
    // pendant edge that adds wedges on the c side but no 4-cycle
    val e = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c2", "s2"),
      ("c3", "s1")).toDF("src_key", "dst_key")
    val r = Algorithms.butterflies(e).head()
    assert(r.getLong(0) == 1, "one supplier pair with >=2 common")
    assert(r.getLong(1) == 1, "exactly one butterfly")
    // wedge totals: customers c1,c2 have deg 2 -> 1 wedge each;
    // suppliers s1 deg 3 -> 3, s2 deg 2 -> 1
    assert(r.getLong(2) == 2 && r.getLong(3) == 4)
  }

  test("pagerank mass is conserved and hubs rank higher") {
    val star = und("hub" -> "x1", "hub" -> "x2", "hub" -> "x3", "x1" -> "x2")
    val pr = Algorithms.pageRank(star, iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 4.0) < 0.05, s"mass drifted: $pr")
    assert(pr("hub") > pr("x3"))
  }

  test("weighted sssp matches hand-computed distances") {
    import spark.implicits._
    val e = Seq(("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0), ("c", "d", 1.0))
      .toDF("a", "b", "w")
    val both = e.unionByName(e.select(col("b").as("a"), col("a").as("b"), col("w")))
    val d = Traversal.shortestPathsWeighted(both, "a")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d == Map("a" -> 0.0, "b" -> 1.0, "c" -> 3.0, "d" -> 4.0))
  }

  test("hyperball estimates track exact 3-hop reach within HLL error") {
    val ue = GraphBuilder.undirectedFor(spark, sfDir).localCheckpoint()
    val est = Algorithms.neighborhoodSizes(ue, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact ≤3-hop reach per node (self included)
    val d1 = ue.select(col("a"), col("b"))
    val d2 = d1.as("x").join(d1.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("y.b").as("b"))
    val d3 = d2.as("x").join(d1.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("y.b").as("b"))
    val self = d1.select(col("a"), col("a").as("b"))
    val exact = self.unionByName(d1).unionByName(d2).unionByName(d3)
      .distinct().groupBy("a").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    val worst = exact.map { case (n, ex) =>
      math.abs(est(n) - ex).toDouble / ex }.max
    assert(worst < 0.15, s"worst relative error $worst exceeds HLL bound")
    // deterministic: max-based register merges are order-free
    val again = Algorithms.neighborhoodSizes(ue, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est)
  }

  test("eccentricity is exact on a path graph (sparse-mode HLL)") {
    // path a—b—c—d: ecc(a) = ecc(d) = 3, ecc(b) = ecc(c) = 2; at 4
    // nodes the HLL sketches are exact (sparse mode), so the
    // ball-growth detection — and therefore ecc — is exact
    val e = und("a" -> "b", "b" -> "c", "c" -> "d")
    val got = Algorithms.eccentricity(e, 4)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 3, "b" -> 2, "c" -> 2, "d" -> 3))
    // maxDepth caps the report: depth 2 clamps the endpoints
    val capped = Algorithms.eccentricity(e, 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(capped == Map("a" -> 2, "b" -> 2, "c" -> 2, "d" -> 2))
  }

  test("neighborhood function and effective diameter, exact on a path") {
    // P4 a—b—c—d: ball sizes per t — t0: 1,1,1,1; t1: 2,3,3,2;
    // t2: 3,4,4,3; t3: all 4 ⇒ N = 4, 10, 14, 16. ANF 0.9-effective
    // diameter: target 14.4 ⇒ 2 + (14.4−14)/(16−14) = 2.2
    val e = und("a" -> "b", "b" -> "c", "c" -> "d")
    val nf = Algorithms.neighborhoodFunction(e, 3)
    val curve = nf.orderBy("t").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(curve == Map(0 -> 4.0, 1 -> 10.0, 2 -> 14.0, 3 -> 16.0), curve)
    val eff = Algorithms.effectiveDiameter(nf).head().getDouble(0)
    assert(eff == 2.2, s"eff diameter $eff")
    // q = 0 degenerates to the first round (prev is null ⇒ t itself)
    assert(Algorithms.effectiveDiameter(nf, 0.1).head().getDouble(0) <= 1.0)
  }

  test("shuffle-regime ball rounds (per-round checkpoint) match the broadcast path") {
    // force the >240k-node round shape — shuffle-partitioned edges,
    // per-round localCheckpoint lineage truncation — onto a
    // spec-sized graph and pin the identical exact P4 curve. HLL
    // register merge is max-per-register, so the materialization
    // boundary must not move a single value.
    val spark = this.spark
    spark.conf.set("graft.ball.broadcastNodes", "0")
    try {
      // fresh frame: the ball memo-cache keys on the DataFrame
      // instance, and a cached broadcast-path curve would shadow
      // the path under test
      val e = und("a" -> "b", "b" -> "c", "c" -> "d")
      val nf = Algorithms.neighborhoodFunction(e, 3)
      val curve = nf.orderBy("t").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(curve == Map(0 -> 4.0, 1 -> 10.0, 2 -> 14.0, 3 -> 16.0), curve)
      val ecc = Algorithms.eccentricity(
          und("a" -> "b", "b" -> "c", "c" -> "d"), 4)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(ecc == Map("a" -> 3, "b" -> 2, "c" -> 2, "d" -> 3))
    } finally spark.conf.unset("graft.ball.broadcastNodes")
  }

  test("betweenness is exact on path and star when every node is a seed") {
    // P4 a—b—c—d: BC(b) = BC(c) = 2, endpoints 0 (k ≥ n ⇒ the
    // sampling estimator degenerates to exact Brandes, scale = 1/2
    // over directed dependency sums)
    val p = Algorithms.betweenness(und("a" -> "b", "b" -> "c", "c" -> "d"),
        k = 16, maxDepth = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(p == Map("a" -> 0.0, "b" -> 2.0, "c" -> 2.0, "d" -> 0.0), p)
    // star: center carries every leaf pair = C(3,2) = 3
    val s = Algorithms.betweenness(
        und("x" -> "a", "x" -> "b", "x" -> "c"), k = 16, maxDepth = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s == Map("x" -> 3.0, "a" -> 0.0, "b" -> 0.0, "c" -> 0.0), s)
  }

  test("betweenness regimes agree: seed-parallel broadcast == shuffle rounds") {
    // two triangles bridged by c—d plus a chord b—e: multiple equal-
    // length paths exercise the σ ratios, truncation at maxDepth=2
    // exercises the bounded-radius contract in both regimes
    def g = und("a" -> "b", "b" -> "c", "a" -> "c",
      "d" -> "e", "e" -> "f", "d" -> "f", "c" -> "d", "b" -> "e")
    for (depth <- Seq(2, 4)) {
      val bcast = Algorithms.betweenness(g, k = 16, maxDepth = depth)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      spark.conf.set("graft.betweenness.broadcastEdges", "0")
      val shuffle =
        try Algorithms.betweenness(g, k = 16, maxDepth = depth)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        finally spark.conf.unset("graft.betweenness.broadcastEdges")
      assert(bcast == shuffle, s"depth=$depth: $bcast vs $shuffle")
    }
  }

  test("non-string node ids ride the shuffle regimes, types intact") {
    import spark.implicits._
    // the broadcast kernels key on STRING node columns; a long-keyed
    // adjacency must fall to the type-generic shuffle regime at any
    // size and keep its id type end to end
    val und = GraphBuilder.undirected(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src_key", "dst_key"))
    val bc = Algorithms.betweenness(und, k = 16, maxDepth = 4)
    assert(bc.schema("node").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(bc.count() == 4)
    val cores = Algorithms.kCore(und)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cores == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 1))
    val walks = Algorithms.deterministicWalks(und, 2)
    assert(walks.schema("node").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(walks.filter(col("step") === 2).count() == 4)
  }

  test("modularity matches the hand-computed two-triangle value") {
    import spark.implicits._
    // two triangles bridged by one edge; the natural partition:
    // m = 7, per community e_c = 3, d_c = 7 ⇒
    // Q = 2 × (3/7 − (7/14)²) = 0.357143 (contribution 0.178571 each)
    val e = und("a" -> "b", "b" -> "c", "a" -> "c",
      "d" -> "e", "e" -> "f", "d" -> "f", "c" -> "d")
    val labels = Seq("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "d").toDF("node", "community")
    val rows = Algorithms.modularity(e, labels).orderBy("community")
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 3)          // n_nodes
      assert(r.getLong(2) == 3)          // internal_edges
      assert(r.getLong(3) == 7)          // degree_sum
      assert(r.getDouble(4) == 0.178571) // contribution
    }
    // the degenerate all-one-community partition scores 0 exactly
    val one = Seq("a", "b", "c", "d", "e", "f").map(_ -> "a")
      .toDF("node", "community")
    val q0 = Algorithms.modularity(e, one)
      .agg(round(sum("contribution"), 6)).head().getDouble(0)
    assert(q0 == 0.0)
  }

  test("harmonic centrality is exact on a path graph (sparse-mode HLL)") {
    // path a—b—c—d, depth 3: H(a) = 1 + 1/2 + 1/3 = 1.8333,
    // H(b) = 1 + 1 + 1/2 = 2.5 (symmetric for c, d). At 4 nodes the
    // HLL sketches are in exact sparse mode, so the ball-size deltas
    // — and therefore the centralities — are exact, not estimates.
    val e = und("a" -> "b", "b" -> "c", "c" -> "d")
    val got = Algorithms.harmonicCentrality(e, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.8333, "b" -> 2.5, "c" -> 2.5, "d" -> 1.8333))
    // determinism: HLL register merges are max-based, order-free
    val again = Algorithms.harmonicCentrality(e, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("node similarity: neighbor-set jaccard with hand-computed values") {
    import spark.implicits._
    // s1: {c1,c2,c3}  s2: {c2,c3,c4}  s3: {c4}
    // J(s1,s2) = 2/4 = 0.5; J(s2,s3) = 1/3; J(s1,s3) = 0 (no shared
    // customer → pair never materializes)
    val e = Seq(("c1", "s1"), ("c2", "s1"), ("c3", "s1"),
        ("c2", "s2"), ("c3", "s2"), ("c4", "s2"),
        ("c4", "s3"))
      .toDF("src_key", "dst_key")
    val got = Algorithms.nodeSimilarity(e, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got == Map(("s1", "s2") -> 0.5, ("s2", "s3") -> 0.3333))
  }

  test("withAKeyed: one-shot frames skip the memo and are freed; " +
      "stable frames share one memoized instance") {
    import org.apache.spark.storage.StorageLevel
    val before = GraphBuilder.aKeyedCacheSize
    // one-shot: a fresh frame per call (the dedup keeper-resolution
    // shape) — the scratch copy must be unpersisted when the scope
    // closes and must never enter the memo
    val oneShot = und("a" -> "b", "b" -> "c", "d" -> "e")
    var seen: org.apache.spark.sql.DataFrame = null
    val cc = GraphBuilder.withAKeyed(oneShot) { k =>
      seen = k
      k.count()
      k
    }
    assert(cc eq seen)
    assert(seen.storageLevel == StorageLevel.NONE,
      "scratch a-keyed copy must be unpersisted after the scope")
    assert(GraphBuilder.aKeyedCacheSize == before,
      "one-shot frames must not occupy the memo")
    // the full algorithm path: result stays correct and usable AFTER
    // the scratch frame was freed (results are checkpoint-rooted)
    val comp = Algorithms.connectedComponents(oneShot)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d"))
    assert(GraphBuilder.aKeyedCacheSize == before)
    // stable: the registered instance memoizes — same a-keyed frame
    // both times
    val stable = GraphBuilder.markStable(und("a" -> "b", "b" -> "c"))
    var first: org.apache.spark.sql.DataFrame = null
    var second: org.apache.spark.sql.DataFrame = null
    GraphBuilder.withAKeyed(stable) { k => first = k; k.count() }
    GraphBuilder.withAKeyed(stable) { k => second = k }
    assert(first eq second, "stable frames must share one memo entry")
  }

  test("broadcast kernels drop null node ids like the equi-join regimes") {
    import spark.implicits._
    // 4-cycle plus a null-keyed edge, symmetrized by hand: before the
    // fix, the null survived groupBy into the broadcast map and
    // ids.sorted in the peeling kernel threw
    val e = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c"), ("d", "a"), ("a", "d"),
      (null.asInstanceOf[String], "a"), ("a", null.asInstanceOf[String]))
      .toDF("a", "b")
    val cores = Algorithms.kCore(e) // under ceiling → broadcast regime
      .filter(col("node").isNotNull)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cores == Map("a" -> 2, "b" -> 2, "c" -> 2, "d" -> 2))
  }
}
