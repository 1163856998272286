package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for perf iteration: runs each named
  * query `SPARK_GRAFT_REPS` times (default 3) and prints every rep —
  * this host's timings swing run to run, so compare best-of-N, never
  * one sample (`sbt "runMain graft.Profile g_pagerank ..."`).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally { // same warmup as Bench
      val r = spark.range(0, 1000000).selectExpr("id", "id % 97 AS k")
      r.join(r.groupBy("k").count(), "k").agg(Map("count" -> "sum")).count()
    }
    args.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name reps=${times.map(t => f"$t%.2f").mkString(",")} best=${times.min}%.2f")
    }
    spark.stop()
  }
}
