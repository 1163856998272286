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
    // SPARK_GRAFT_EXPLAIN=true: dump the 5-round chain's formatted
    // plan (the bench key explains only its memoized tail, so the
    // round plan — where the r12 exchange-removal lives — is only
    // visible here) and exit
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "true")) {
      // EXECUTED (post-AQE) plans, not pre-execution explains: the
      // round chain executes inside labelPropagation's materialize(),
      // and the shapes that matter (ReusedExchange, AQEShuffleRead,
      // runtime BHJ conversion) only exist after execution. A
      // listener captures every SQL execution's executedPlan; the
      // round chain is the largest one.
      val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            plans.add(s"-- execution: $funcName --\n" +
              qe.executedPlan.toString)
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
      graft.graph.Algorithms.labelPropagation(edges, steps = 5).count()
      Thread.sleep(2000) // listener bus drain
      import scala.jdk.CollectionConverters._
      val biggest = plans.asScala.toSeq.sortBy(-_.length).headOption
        .getOrElse("(no executions captured)")
      println("===== lpa round chain, executed plan =====")
      println(biggest)
      spark.stop(); return
    }
    // warm the LPA plan/codegen once (untimed)
    graft.graph.Algorithms.labelPropagation(edges, steps = 5).count()
    val meter = new graft.util.StageMeter(spark.sparkContext)
    for (leg <- Seq("on", "off", "off", "on")) {
      if (leg == "off") spark.conf.set("graft.lpa.broadcastNodes", "0")
      else spark.conf.unset("graft.lpa.broadcastNodes")
      meter.reset()
      val t0 = System.nanoTime()
      val n = graft.graph.Algorithms.labelPropagation(edges, steps = 5)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (st, sw, sr) = meter.snapshot()
      println(f"[lpa-ab] hint=$leg rows=$n wall=$wall%.2fs " +
        f"stages=$st shufWrite=${sw / 1024}KB shufRead=${sr / 1024}KB")
    }
    spark.stop()
  }
}
