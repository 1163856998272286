package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraphX/Pregel alternative backend for the whole-graph
  * algorithms. The DataFrame implementations in [[Algorithms]] are
  * the default (Tungsten rows, AQE, no RDD serialization); this
  * bridge exists for workloads that want Pregel semantics or an
  * algorithm GraphX already ships (reference vision: "massively
  * scalable" batch graph analytics). Equivalence with the DataFrame
  * path is pinned in GraphXSpec.
  */
object GraphXBridge {

  /** One shared DataFrame→GraphX conversion for every algorithm in
    * this bridge: vertex ids are xxhash64 of the string keys, the
    * original key rides as the vertex attribute, and the edge
    * attribute is the `wCol` column cast to double (1.0 when None).
    * RDDs are coalesced to [[graphParallelism]] partitions. */
  private def buildGraph(edges: DataFrame, wCol: Option[String])
      : Graph[String, Double] = {
    val p = graphParallelism(edges)
    val w = wCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val withIds = edges.select(
      xxhash64(col("a")).as("srcId"), col("a"),
      xxhash64(col("b")).as("dstId"), col("b"), w.as("w"))
    val vertices = withIds.select(col("srcId").as("id"), col("a").as("key"))
      .unionByName(withIds.select(col("dstId").as("id"), col("b").as("key")))
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getString(1))).coalesce(p)
    val edgeRdd = withIds
      .rdd.map(r => Edge(r.getLong(0), r.getLong(2), r.getDouble(4)))
      .coalesce(p)
    Graph(vertices, edgeRdd)
  }

  /** [[buildGraph]] with unit edge weights, memoized per input
    * DataFrame instance (DataFrames are immutable; GraphBuilder
    * already hands every caller the same memoized adjacency frame per
    * (session, dir)) — without this each of the GraphX-backed queries
    * re-runs the full DataFrame→RDD conversion including the vertex
    * `distinct()` shuffle. The Graph's internal RDDs default to
    * MEMORY_ONLY, so algorithms on the shared instance reuse the
    * materialized partitions. The cache is a small bounded LRU and
    * EVICTED graphs are unpersisted: an unbounded map of
    * MEMORY_ONLY-cached graphs would pin executor storage (and the
    * owning sessions) forever in a long-lived service. */
  def fromUndirected(edges: DataFrame): Graph[String, Double] =
    graphCache.getOrElseUpdate(edges)(buildGraph(edges, None))

  /** RDD partition count for a graph build, sized from the edge
    * count: GraphX's per-superstep cost has a partitions-squared
    * component (vertex replication routing tables + one shuffle per
    * superstep whose task overhead dwarfs sub-100k-edge partitions),
    * so running a 1M-edge graph at 32 partitions benched 4-6x slower
    * than at 8. ~150k edges per partition, floored at 4 for spec-size
    * graphs and capped at the session's parallelism — at cluster
    * scale (billions of edges) the cap is what binds, so this grows
    * to full cluster width exactly when the data needs it. coalesce,
    * not repartition: merging shuffle output needs no extra exchange.
    * The count() is one cheap scan when callers pass GraphBuilder's
    * memoized localCheckpoint'd adjacency (every in-repo caller
    * does); hand a checkpointed frame in here for the same reason. */
  private def graphParallelism(edges: DataFrame): Int = {
    val n = edges.count()
    val target = (n / 150000L).toInt
    math.max(4, math.min(
      edges.sparkSession.sparkContext.defaultParallelism, target))
  }

  // evicted graphs are unpersisted best-effort (the owning session
  // may already be stopped); builds run outside the cache lock so a
  // slow graph build never stalls hits on already-cached graphs
  private val graphCache = new graft.util.LruCache[DataFrame, Graph[String, Double]](
    8, _.unpersist(blocking = false))
  graft.util.Memos.registerDerived(() => graphCache.clear())

  /** GraphX PageRank, returned as (node, rank) keyed by the original
    * string keys. */
  def pageRank(edges: DataFrame, iters: Int = 10,
      resetProb: Double = 0.15): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    val ranks = org.apache.spark.graphx.lib.PageRank
      .runWithOptions(g, iters, resetProb)
    g.vertices.join(ranks.vertices)
      .map { case (_, (key, rank)) => (key, rank) }
      .toDF("node", "rank")
  }

  /** GraphX personalized PageRank: random walks restart at `source`
    * instead of uniformly, so rank measures proximity to the seed —
    * the "related nodes" primitive (recommendations, local graph
    * expansion) at whole-graph scale. Deterministic for a fixed
    * iteration count. Returns (node, rank) on original keys. */
  def personalizedPageRank(edges: DataFrame, source: String,
      iters: Int = 10, resetProb: Double = 0.15): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    // same expression the vertex ids were built with
    val srcId = spark.range(1).select(xxhash64(lit(source))).head().getLong(0)
    val ranks = org.apache.spark.graphx.lib.PageRank
      .runWithOptions(g, iters, resetProb, srcId = Some(srcId))
    g.vertices.join(ranks.vertices)
      .map { case (_, (key, rank)) => (key, rank) }
      .toDF("node", "rank")
  }

  /** GraphX label-propagation communities: each node adopts its
    * neighbors' most frequent label for `steps` supersteps.
    * Community ids are surfaced as the smallest ORIGINAL member key
    * of each raw label, so output is stable to rename even though
    * LPA's frequency ties are inherently order-dependent (rows-only
    * query; the spec pins partition validity, not exact labels). */
  def labelPropagation(edges: DataFrame, steps: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    val labels = org.apache.spark.graphx.lib.LabelPropagation.run(g, steps)
    val keyed = g.vertices.join(labels.vertices)
      .map { case (_, (key, label)) => (label, key) }
    // canonical community name = min member key of the label
    val canon = keyed.reduceByKey((a, b) => if (a <= b) a else b)
    keyed.join(canon)
      .map { case (_, (key, cname)) => (key, cname) }
      .toDF("node", "community")
  }

  /** GraphX triangle count (per-vertex, summed/3 for the global
    * figure). Edges are canonicalized (srcId < dstId, deduplicated)
    * and the graph partitioned as triangleCount requires. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    val canonical = Graph(g.vertices,
      g.edges.map(e => if (e.srcId < e.dstId) e
        else Edge(e.dstId, e.srcId, e.attr)).distinct())
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    val tc = canonical.triangleCount()
    // aggregate on the executors; each triangle is counted at its
    // three vertices
    val total = tc.vertices.map { case (_, n) => n.toLong }
      .fold(0L)(_ + _) / 3
    Seq(total).toDF("n_triangles")
  }

  /** Per-node triangle participation counts (the per-vertex half of
    * [[triangleCount]], surfaced): how many triangles each node is a
    * corner of. Σ over nodes = 3 × the global count. */
  def trianglesPerNode(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    val canonical = Graph(g.vertices,
      g.edges.map(e => if (e.srcId < e.dstId) e
        else Edge(e.dstId, e.srcId, e.attr)).distinct())
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    val tc = canonical.triangleCount()
    g.vertices.join(tc.vertices)
      .map { case (_, (key, n)) => (key, n.toLong) }
      .toDF("node", "n_triangles")
  }

  /** GraphX landmark shortest paths (unweighted hop counts) from one
    * source key — the Pregel form of Traversal.bfsLevels. */
  def bfsLevels(edges: DataFrame, source: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    // same expression the vertex ids were built with
    val srcId = spark.range(1).select(xxhash64(lit(source))).head().getLong(0)
    val sp = org.apache.spark.graphx.lib.ShortestPaths.run(g, Seq(srcId))
    g.vertices.join(sp.vertices)
      .flatMap { case (_, (key, dists)) =>
        dists.get(srcId).map(d => (key, d))
      }
      .toDF("node", "depth")
  }

  /** Depth-bounded BFS levels on the SHARED memoized graph — the
    * Pregel form of Traversal.bfsLevels (the reference's `maxdepth`
    * k-hop semantics). `maxIterations = maxDepth` stops the
    * supersteps at the bound, so the cost on a huge-diameter graph
    * is the k levels asked for, not the full eccentricity; the
    * DataFrame frontier loop in Traversal stays as the spec-pinned
    * equivalent alternative. */
  def bfsLevelsBounded(edges: DataFrame, source: String,
      maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val base = fromUndirected(edges)
    val srcId = spark.range(1).select(xxhash64(lit(source))).head().getLong(0)
    val init = base.mapVertices((id, _) =>
      if (id == srcId) 0 else Int.MaxValue)
    val res = init.pregel(Int.MaxValue, maxIterations = maxDepth)(
      (_, d, m) => math.min(d, m),
      t =>
        if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
          Iterator((t.dstId, t.srcAttr + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    base.vertices.join(res.vertices)
      .flatMap { case (_, (key, d)) =>
        if (d == Int.MaxValue) None else Some((key, d))
      }
      .toDF("node", "depth")
      // the seed is depth 0 even when it has no edges (and is thus
      // absent from the edge-derived vertex set) — the frontier-loop
      // implementation and the oracle both seed unconditionally
      .unionByName(Seq((source, 0)).toDF("node", "depth"))
      .groupBy("node").agg(min("depth").as("depth"))
  }

  /** Pregel weighted single-source shortest paths — the GraphX form
    * of Traversal.shortestPathsWeighted. Edges: (a, b, w); returns
    * (node, dist) for reachable nodes. Converges in ≤ diameter
    * supersteps, messages flow only along still-improving edges. */
  def shortestPathsWeighted(edges: DataFrame, source: String): DataFrame =
    // one shared builder with the weight column riding as the edge
    // attribute (cast to double there — an int/decimal w would
    // otherwise ClassCastException); built ONCE and its vertices
    // reused for the final key join
    ssspOn(buildGraph(edges, Some("w")), edges, source)

  /** Unit-weight shortest paths on the SHARED memoized graph — the
    * Pregel kernel is identical to [[shortestPathsWeighted]] (the
    * cached graph's edge attribute is 1.0), but the graph build is
    * reused across every bridge algorithm instead of rebuilt. */
  def shortestPathsUnit(edges: DataFrame, source: String): DataFrame =
    ssspOn(fromUndirected(edges), edges, source)

  private def ssspOn(base: Graph[String, Double], edges: DataFrame,
      source: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val srcId = spark.range(1).select(xxhash64(lit(source))).head().getLong(0)
    val g = base
      .mapVertices((id, _) => if (id == srcId) 0.0 else Double.PositiveInfinity)
    val sp = g.pregel(Double.PositiveInfinity)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr + triplet.attr < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + triplet.attr))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    base.vertices.join(sp.vertices)
      .flatMap { case (_, (key, d)) =>
        if (d.isInfinity) None else Some((key, d))
      }
      .toDF("node", "dist")
  }

  /** GraphX connected components (Pregel), labeled like
    * [[Algorithms.connectedComponents]]: each component named by its
    * lexicographically smallest member key. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val g = fromUndirected(edges)
    val cc = g.connectedComponents()
    val keyed = g.vertices.join(cc.vertices)
      .map { case (_, (key, comp)) => (comp, key) }
    val compName = keyed.reduceByKey((a, b) => if (a <= b) a else b)
    keyed.join(compName)
      .map { case (_, (key, name)) => (key, name) }
      .toDF("node", "component")
  }
}
