package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (not part of the library surface): times the
  * GraphX-backed algorithms at different RDD partition counts to size
  * the graph-build parallelism. Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PerfProbe"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.graphx.{Edge, Graph}

    val und = graph.GraphBuilder.undirectedFor(spark, sfDir)
    println(s"edges=${und.count()}")

    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (p <- Seq(8, 4, 2)) {
      val withIds = und.select(
        xxhash64(col("a")).as("srcId"), col("a"),
        xxhash64(col("b")).as("dstId"), col("b"))
      val vertices = withIds.select(col("srcId").as("id"), col("a").as("key"))
        .unionByName(withIds.select(col("dstId").as("id"), col("b").as("key")))
        .distinct()
        .rdd.map(r => (r.getLong(0), r.getString(1))).repartition(p)
      val edgeRdd = withIds
        .rdd.map(r => Edge(r.getLong(0), r.getLong(2), 1)).repartition(p)
      val g = Graph(vertices, edgeRdd)
      time(s"p=$p build+cc1") { g.connectedComponents().vertices.count() }
      time(s"p=$p cc2") { g.connectedComponents().vertices.count() }
    }
    time("df-cc") {
      graph.Algorithms.connectedComponents(und).count()
    }
    time("bridge-cc-full") {
      graph.GraphXBridge.connectedComponents(und).count()
    }
    time("bridge-cc-warm") {
      graph.GraphXBridge.connectedComponents(und).count()
    }
    spark.stop()
  }
}
