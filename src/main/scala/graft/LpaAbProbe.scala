package graft

import org.apache.spark.sql.functions._

/** Scratch A/B probe (not library surface): labelPropagation with the
  * broadcast-regime hint ON (default ceiling) vs OFF
  * (graft.lpa.broadcastNodes=0), over a PRE-BUILT adjacency — so the
  * delta is the round-join plan alone, not the shared a-keyed build
  * the bench bills to whichever graph key runs first. ABBA order,
  * one JVM. */
object LpaAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.graph.GraphBuilder.undirectedFor(spark, dir)
    edges.count() // warm the shared adjacency OUTSIDE the timed legs
    // warm the LPA plan/codegen once (untimed)
    graft.graph.Algorithms.labelPropagation(edges, steps = 5).count()
    for (leg <- Seq("on", "off", "off", "on")) {
      if (leg == "off") spark.conf.set("graft.lpa.broadcastNodes", "0")
      else spark.conf.unset("graft.lpa.broadcastNodes")
      val t0 = System.nanoTime()
      val n = graft.graph.Algorithms.labelPropagation(edges, steps = 5)
        .count()
      println(f"[lpa-ab] hint=$leg rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
