package graft

import org.apache.spark.sql.functions._

/** Scratch A/B probe (not library surface): can Spark 4's
  * `mode(label, deterministic=true)` — "lowest value on frequency
  * ties" — replace labelPropagation's two-level
  * groupBy(a,label).count → groupBy(a).min_by round aggregation
  * (one shuffle per round instead of two, but an imperative
  * ObjectHashAggregate instead of two codegen'd hash aggs)?
  * Part 1 pins the tie-break semantics on a literal tie; part 2
  * races the two 5-round chains ABBA over the warm adjacency and
  * checks row-identical output. */
object LpaModeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // tie-break pin: b/c tie at count 2 each -> expect "b" (lowest)
    val tie = Seq(("n1", "c"), ("n1", "b"), ("n1", "c"), ("n1", "b"))
      .toDF("a", "label")
    val got = tie.groupBy("a").agg(mode(col("label"), true).as("m"))
      .collect()(0).getString(1)
    println(s"[lpamode] tie-break: mode=deterministic returned '$got' " +
      s"(expect 'b' = lowest of the tied)")

    val edges = graft.graph.GraphBuilder.undirectedFor(spark, dir)
    edges.count()
    def chain(useMode: Boolean): org.apache.spark.sql.DataFrame = {
      var labels = edges.select(col("a").as("node"))
        .distinct().withColumn("label", col("node"))
      for (_ <- 1 to 5) {
        val st = broadcast(labels)
        labels =
          (if (useMode)
            edges.join(st, edges("b") === st("node"))
              .groupBy(col("a"))
              .agg(mode(col("label"), true).as("label"))
          else
            edges.join(st, edges("b") === st("node"))
              .groupBy(col("a"), col("label"))
              .agg(count(lit(1)).as("c"))
              .groupBy(col("a"))
              .agg(min_by(col("label"), struct((-col("c")).as("nc"),
                col("label").as("l"))).as("label")))
            .withColumnRenamed("a", "node")
      }
      labels
    }
    // row-identity first (also warms both plans)
    val a = chain(useMode = false).collect().map(r =>
      (r.getString(0), r.getString(1))).sorted
    val b = chain(useMode = true).collect().map(r =>
      (r.getString(0), r.getString(1))).sorted
    println(s"[lpamode] rows classic=${a.length} mode=${b.length} " +
      s"identical=${a.sameElements(b)}")
    for (leg <- Seq("classic", "mode", "mode", "classic")) {
      val t0 = System.nanoTime()
      val n = chain(leg == "mode").count()
      println(f"[lpamode] leg=$leg rows=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
