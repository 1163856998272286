package graft

/** Scratch A/B probe (not library surface): is the memoized a-keyed
  * repartition+checkpoint (GraphBuilder.aKeyed) worth its build cost?
  *
  * r12 established that a localCheckpoint's LogicalRDD reports
  * UnknownPartitioning under AQE — so the partitioning the aKeyed
  * copy was built to carry is INVISIBLE to every consumer's planner:
  * round joins/aggs re-exchange (or broadcast) exactly as they would
  * over the raw memoized adjacency, and LPA/ballSizes now establish
  * their own pinned in-plan repartitions anyway. If the operators
  * measure flat raw-vs-checkpointed, the build (a full 2|E| shuffle +
  * checkpoint write per bench pass, billed to the alphabetically
  * first consumer — g_communities) is pure cost.
  *
  * ABBA in one JVM; Memos reset before every leg so EACH leg pays its
  * own derived builds (that is the cost being measured). */
object AkProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val ug = graft.graph.GraphBuilder.undirectedFor(spark, dir)
    ug.count() // warm the shared adjacency (bench warm() does too)

    def leg(tag: String, mode: String): Unit = {
      spark.conf.set("graft.akeyed.raw", (mode == "raw").toString)
      graft.util.Memos.resetDerived()
      val ops: Seq[(String, () => Long)] = Seq(
        "lpa5" -> (() =>
          graft.graph.Algorithms.labelPropagation(ug, 5).count()),
        "dfs_path" -> (() =>
          graft.graph.Traversal.pathBetween(ug, "c:1", "s:5").count()))
      ops.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn()
        println(f"[ak-probe] $tag mode=$mode op=$name rows=$n " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    for ((m, i) <- Seq("ck", "raw", "raw", "ck").zipWithIndex)
      leg(s"leg$i", m)

    // the build alone, timed cold (reset first)
    spark.conf.set("graft.akeyed.raw", "false")
    graft.util.Memos.resetDerived()
    val t0 = System.nanoTime()
    graft.graph.GraphBuilder.aKeyed(ug).count()
    println(f"[ak-probe] akeyed build alone: ${
      (System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
