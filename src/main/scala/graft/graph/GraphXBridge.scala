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

  /** Build a GraphX graph from a string-keyed undirected adjacency
    * (a, b); vertex ids are xxhash64 of the keys, the original key
    * rides as the vertex attribute.
    *
    * Memoized per input DataFrame instance (DataFrames are immutable;
    * GraphBuilder already hands every caller the same memoized
    * adjacency frame per (session, dir)) — without this each of the
    * GraphX-backed queries re-runs the full DataFrame→RDD conversion
    * including the vertex `distinct()` shuffle. The Graph's internal
    * RDDs default to MEMORY_ONLY, so algorithms on the shared
    * instance reuse the materialized partitions. */
  def fromUndirected(edges: DataFrame): Graph[String, Int] =
    graphCache.getOrElseUpdate(edges, {
      val p = graphParallelism(edges)
      val withIds = edges.select(
        xxhash64(col("a")).as("srcId"), col("a"),
        xxhash64(col("b")).as("dstId"), col("b"))
      val vertices = withIds.select(col("srcId").as("id"), col("a").as("key"))
        .unionByName(withIds.select(col("dstId").as("id"), col("b").as("key")))
        .distinct()
        .rdd.map(r => (r.getLong(0), r.getString(1))).coalesce(p)
      val edgeRdd = withIds
        .rdd.map(r => Edge(r.getLong(0), r.getLong(2), 1)).coalesce(p)
      Graph(vertices, edgeRdd)
    })

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
    * The count is cheap: every caller hands in GraphBuilder's
    * memoized localCheckpoint'd adjacency. */
  private def graphParallelism(edges: DataFrame): Int = {
    val n = edges.count()
    val target = (n / 150000L).toInt
    math.max(4, math.min(
      edges.sparkSession.sparkContext.defaultParallelism, target))
  }

  // keyed on the DataFrame reference (reference equality): safe
  // because frames are immutable and upstream memoization dedups
  // instances; a fresh frame per call just skips the cache
  private val graphCache = scala.collection.concurrent.TrieMap
    .empty[DataFrame, Graph[String, Int]]

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

  /** Pregel weighted single-source shortest paths — the GraphX form
    * of Traversal.shortestPathsWeighted. Edges: (a, b, w); returns
    * (node, dist) for reachable nodes. Converges in ≤ diameter
    * supersteps, messages flow only along still-improving edges. */
  def shortestPathsWeighted(edges: DataFrame, source: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val p = graphParallelism(edges)
    val withIds = edges.select(
      xxhash64(col("a")).as("srcId"), col("a"),
      xxhash64(col("b")).as("dstId"), col("b"),
      // normalize like the key columns (xxhash64): an int/decimal w
      // would otherwise hit getDouble's ClassCastException at runtime
      col("w").cast("double").as("w"))
    val vertices = withIds.select(col("srcId").as("id"), col("a").as("key"))
      .unionByName(withIds.select(col("dstId").as("id"), col("b").as("key")))
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getString(1))).coalesce(p)
    val edgeRdd = withIds.rdd.map(r => Edge(r.getLong(0), r.getLong(2),
      r.getDouble(4))).coalesce(p)
    val srcId = spark.range(1).select(xxhash64(lit(source))).head().getLong(0)
    // build the base graph ONCE and reuse its vertices for the final
    // key join — a second Graph(vertices, edgeRdd) would re-run the
    // whole DataFrame→RDD conversion (xxhash64 scan + distinct)
    val base = Graph(vertices, edgeRdd)
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
