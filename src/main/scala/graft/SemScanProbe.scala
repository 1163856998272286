package graft

/** Scratch probe (not library surface): attribution re-measure of
  * semDedupScaled's post-assign remainder at ladder scale. The r12
  * 8192× rung (tools/semdedup_8192x_r12.txt) recorded a ~210 s warm
  * remainder under host load 17-20 and could only theorize its
  * composition; this probe runs the d_semdedup_scaled query solo with
  * `graft.semdedup.stageTimes` on and prints the cellKeepersScan
  * accumulator split (decode / sort / scan, task-summed CPU) after
  * each pass, so the next-octave lever is chosen against measured
  * attribution instead of a load-inflated guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graftv8192 SPARK_GRAFT_SHUFFLE=512 \
  *        tools/runjava.sh graft.SemScanProbe [passes]
  */
object SemScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graftv8192")
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.semdedup.stageTimes", "true")
    for (pass <- 1 to passes) {
      graft.util.Memos.resetDerived()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d_semdedup_scaled")(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[semscan] pass=$pass rows=$n wall=$wall%.1fs " +
        s"loadavg=${scala.io.Source.fromFile("/proc/loadavg").mkString.trim}")
      graft.ann.Knn.ScanTelemetry.last
        .foreach(t => println("[semscan] " + t.report))
    }
    spark.stop()
  }
}
