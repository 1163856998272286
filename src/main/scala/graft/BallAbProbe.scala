package graft

/** Scratch A/B + executed-plan probe for the HyperBall round chain
  * (ballSizes) — the same harness shape as LpaAbProbe: pre-built
  * adjacency, warmed plan, ABBA legs with runtime stage/shuffle
  * metering. SPARK_GRAFT_EXPLAIN=true captures the largest executed
  * (post-AQE) plan instead. The ball memo is reset between legs so
  * every leg re-runs the rounds. */
object BallAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.graph.GraphBuilder.undirectedFor(spark, dir)
    edges.count()
    // warm plan/codegen once (untimed)
    graft.graph.Algorithms.ballSizes(edges, 4).count()
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "true")) {
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
      graft.util.Memos.resetDerived()
      graft.graph.Algorithms.ballSizes(
        graft.graph.GraphBuilder.undirectedFor(spark, dir), 4).count()
      Thread.sleep(2000)
      import scala.jdk.CollectionConverters._
      val biggest = plans.asScala.toSeq.sortBy(-_.length).headOption
        .getOrElse("(no executions captured)")
      println("===== ball round chain, executed plan =====")
      println(biggest)
      spark.stop(); return
    }
    val meter = new graft.util.StageMeter(spark.sparkContext)
    for (leg <- 1 to 4) {
      graft.util.Memos.resetDerived()
      val e = graft.graph.GraphBuilder.undirectedFor(spark, dir)
      e.count()
      meter.reset()
      val t0 = System.nanoTime()
      val n = graft.graph.Algorithms.ballSizes(e, 4).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (st, sw, sr) = meter.snapshot()
      println(f"[ball-ab] leg=$leg rows=$n wall=$wall%.2fs " +
        f"stages=$st shufWrite=${sw / 1024}KB shufRead=${sr / 1024}KB")
    }
    spark.stop()
  }
}
