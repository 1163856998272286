package graft

/** Plan auditor: prints the formatted physical plan of selected
  * queries so pushdown / pruning / broadcast / codegen spans can be
  * inspected (`sbt "runMain graft.Explain q6_filter ..."`). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // show the whole operator tree: materialize() boundaries become
    // pass-throughs for the audit (see Materialize "none").
    // SPARK_GRAFT_EXPLAIN_MODE=local keeps the boundaries instead —
    // the right view for counting a round chain's EFFECTIVE
    // exchanges, where inlining the shared checkpointed builds would
    // multiply-count their exchanges.
    spark.conf.set("graft.checkpoint.mode",
      sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "none"))
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q6_filter", "q3_topk", "q5_join5", "i_lookup_text", "s_search_or")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
