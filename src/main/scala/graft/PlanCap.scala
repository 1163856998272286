package graft

/** Executed-plan capture for any declared query: runs each named
  * query once (warm shared inputs first) with a
  * QueryExecutionListener and prints every executed (post-AQE) plan,
  * largest last — the view where ReusedExchange / AQEShuffleRead /
  * runtime join strategy changes are visible, which `graft.Explain`
  * (pre-execution) cannot show.
  * `sbt "runMain graft.PlanCap g_node_sim ..."` (SPARK_GRAFT_SF_DIR). */
object PlanCap {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the shared graph inputs the bench's warm() builds, so the
    // captured plans are the per-key shapes, not the shared builds
    val ug = graft.graph.GraphBuilder.undirectedFor(spark, dir)
    ug.count()
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          plans.add(s"-- execution: $funcName (${durationNs / 1000000} ms) --\n" +
            qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    args.foreach { name =>
      plans.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      import scala.jdk.CollectionConverters._
      println(s"===== $name executed plans (wall ${f"$wall%.2f"}s) =====")
      plans.asScala.toSeq.sortBy(_.length).foreach { p =>
        println(p); println()
      }
    }
    spark.stop()
  }
}
