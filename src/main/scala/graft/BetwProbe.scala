package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe (r12): splits g_betweenness's wall
  * between its sequential driver-visible steps — nodes distinct +
  * count, the broadcast adjacency build (groupBy+collect_list+
  * collect+broadcast), the seed pick, the k-task seed-parallel
  * Brandes sweep, and the final join+agg. Memos reset per leg so
  * the adjacency build is re-billed each time. */
object BetwProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // warm untimed
    graft.graph.Algorithms.betweenness(
      graft.graph.GraphBuilder.undirectedFor(spark, dir), 16, 4).count()
    for (leg <- 1 to 3) {
      graft.util.Memos.resetDerived()
      val ug = graft.graph.GraphBuilder.undirectedFor(spark, dir)
      ug.count()
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t1 = System.nanoTime()
        println(f"[betw] leg=$leg $tag%-12s ${(t1 - t0) / 1e9}%.2fs")
        t0 = t1
      }
      val nodes = ug.select(col("a")).distinct()
      import graft.plans.Materialize._
      val mn = nodes.materialize(true)
      val n = mn.count()
      lap("nodes")
      // replicate broadcastAdjacency's build cost (the real one is
      // private; same plan + collect + broadcast), split into laps
      val grouped = ug
        .filter(col("a").isNotNull && col("b").isNotNull)
        .groupBy(col("a").cast("string").as("a"))
        .agg(collect_list(col("b").cast("string")).as("bs"))
      grouped.count()
      lap("agg-only")
      val rowsArr = grouped.as[(String, Array[String])].collect()
      lap("collect")
      val adj = rowsArr.toMap
      lap("toMap")
      val b = spark.sparkContext.broadcast(adj)
      lap("broadcast")
      // compact alternative: one packed string per node, decoded to
      // the array map once on first task access
      val packed = ug
        .filter(col("a").isNotNull && col("b").isNotNull)
        .groupBy(col("a").cast("string").as("a"))
        .agg(concat_ws("", collect_list(col("b").cast("string")))
          .as("bs"))
        .as[(String, String)].collect()
      lap("collectPacked")
      val b2 = spark.sparkContext.broadcast(packed)
      lap("bcastPacked")
      val decoded = packed.iterator
        .map { case (k, v) => (k, v.split('')) }.toMap
      lap("decodePacked")
      println(s"[betw] leg=$leg decodedKeys=${decoded.size}")
      b2.destroy()
      val seeds = mn.orderBy(md5(col("a").cast("string")), col("a"))
        .limit(16).select(col("a").cast("string")).as[String].collect()
      lap("seeds")
      println(s"[betw] leg=$leg n=$n edges=${ug.count()} " +
        s"adjKeys=${adj.size} seeds=${seeds.length}")
      b.destroy()
      // full operator for reference (memo still holds this leg's
      // real adjacency? no — we built a replica; the real build
      // happens inside betweenness and is billed there)
      t0 = System.nanoTime()
      val rows = graft.graph.Algorithms.betweenness(ug, 16, 4).count()
      lap(s"full(rows=$rows)")
    }
    spark.stop()
  }
}
