package graft

import org.apache.spark.sql.functions._

/** Scratch A/B (r12): the triangle wedge join — the m^1.5 stage
  * behind g_clustering/g_triangles — on STRING corner keys vs
  * xxhash64 LONG keys. ABBA legs, one JVM, best-of compared.
  * `sbt "runMain graft.TriProbe"` (SPARK_GRAFT_SF_DIR). */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val ue = graft.graph.GraphBuilder.undirectedFor(spark, dir)
    ue.count()
    import graft.plans.Materialize._
    val deg = ue.select(col("a").as("node"))
      .unionByName(ue.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val aFirst = struct(col("da").as("d"), col("a").as("n")) <
      struct(col("db").as("d"), col("b").as("n"))
    val eStr = ue.filter(col("a") < col("b"))
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
      .materialize()
    val eLong = eStr.select(xxhash64(col("u")).as("u"), xxhash64(col("v")).as("v"))
      .materialize()
    def wedgeCount(e: org.apache.spark.sql.DataFrame): Long = {
      val wedges = e.select(col("u"), col("v").as("w1"))
        .join(e.select(col("u"), col("v").as("w2")), "u")
        .filter(col("w1") < col("w2"))
      val canon = e.select(least(col("u"), col("v")).as("w1"),
        greatest(col("u"), col("v")).as("w2"))
      wedges.join(broadcast(canon), Seq("w1", "w2")).count()
    }
    // warm both plans once
    wedgeCount(eStr); wedgeCount(eLong)
    for (leg <- Seq("str", "long", "long", "str", "str", "long")) {
      val t0 = System.nanoTime()
      val n = if (leg == "str") wedgeCount(eStr) else wedgeCount(eLong)
      println(f"[tri-ab] keys=$leg triangles=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
