package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf probe (not part of the library surface). */
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
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val und = graph.GraphBuilder.undirectedFor(spark, sfDir)
    println(s"edges=${und.count()}")
    for (r <- 1 to 2) {
      time(s"r$r g_diameter") {
        SparkEntry.queries("g_diameter")(spark, sfDir).count()
      }
      // force FULL materialization (collect all columns) so count
      // pruning cannot hide the sketch cost — the Verify-path cost
      time(s"r$r neighborhoodSizes FULL") {
        graph.Algorithms.neighborhoodSizes(und, 3).collect()
      }
      time(s"r$r eccentricity FULL") {
        graph.Algorithms.eccentricity(und, 4).collect()
      }
    }
  }
}
