package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{Algorithms, GraphBuilder, GraphXBridge}

class GraphXSpec extends AnyFunSuite with SparkFixture {

  test("GraphX connected components agree with the DataFrame path") {
    val edges = GraphBuilder.undirected(
      GraphBuilder.edges(spark, sfDir)).localCheckpoint()
    val df = Algorithms.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gx = GraphXBridge.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(df == gx)
  }

  test("GraphX pagerank ranks the same top node as the DataFrame path") {
    import spark.implicits._
    val edges = GraphBuilder.undirected(Seq(
      ("hub", "x1"), ("hub", "x2"), ("hub", "x3"), ("x1", "x2"))
      .toDF("src_key", "dst_key"))
    def top(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("rank").desc).head().getString(0)
    assert(top(Algorithms.pageRank(edges, 20)) == "hub")
    assert(top(GraphXBridge.pageRank(edges, 20)) == "hub")
  }
}
