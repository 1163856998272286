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
    * rides as the vertex attribute. */
  def fromUndirected(edges: DataFrame): Graph[String, Int] = {
    val withIds = edges.select(
      xxhash64(col("a")).as("srcId"), col("a"),
      xxhash64(col("b")).as("dstId"), col("b"))
    val vertices = withIds.select(col("srcId").as("id"), col("a").as("key"))
      .unionByName(withIds.select(col("dstId").as("id"), col("b").as("key")))
      .distinct()
      .rdd.map(r => (r.getLong(0), r.getString(1)))
    val edgeRdd = withIds
      .rdd.map(r => Edge(r.getLong(0), r.getLong(2), 1))
    Graph(vertices, edgeRdd)
  }

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
