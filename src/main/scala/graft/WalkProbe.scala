package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe (r12): splits g_walks' wall between the
  * choice-table aggregation (edges × length md5 min_by), its
  * materialize, the driver collect + broadcast of the choice map,
  * and the pointer-chase + checkpoint. Memos reset per leg. */
object WalkProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.plans.Materialize._
    val length = 4
    graft.graph.Algorithms.deterministicWalks(
      graft.graph.GraphBuilder.undirectedFor(spark, dir), length).count()
    for (leg <- 1 to 3) {
      graft.util.Memos.resetDerived()
      val ug = graft.graph.GraphBuilder.undirectedFor(spark, dir)
      ug.count()
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t1 = System.nanoTime()
        println(f"[walk] leg=$leg $tag%-14s ${(t1 - t0) / 1e9}%.2fs")
        t0 = t1
      }
      val ch = ug
        .select(col("a").as("cur"), col("b"),
          explode(sequence(lit(1), lit(length))).as("t"))
        .groupBy("cur", "t")
        .agg(min_by(col("b"),
          md5(concat_ws("|", col("cur"), col("t"), col("b")))).as("nxt"))
        .materialize()
      ch.count()
      lap("choiceAgg")
      val table: Map[(String, Int), String] = ch
        .select(col("cur").cast("string"), col("t"),
          col("nxt").cast("string"))
        .as[(String, Int, String)].collect()
        .map { case (c, t, x) => ((c, t), x) }.toMap
      lap("collect")
      val bTable = spark.sparkContext.broadcast(table)
      lap("broadcast")
      println(s"[walk] leg=$leg tableSize=${table.size}")
      bTable.destroy()
      // wide single-pass alternative for the choice agg: no explode,
      // one groupBy(cur) with `length` min_by aggs
      val aggs = (1 to length).map(t => min_by(col("b"),
        md5(concat_ws("|", col("a"), lit(t), col("b")))).as(s"n$t"))
      val wide = ug.groupBy(col("a").as("cur"))
        .agg(aggs.head, aggs.tail: _*).materialize()
      wide.count()
      lap("choiceAggWide")
      val tableW: Map[(String, Int), String] = wide
        .select(col("cur").cast("string"),
          array((1 to length).map(t => col(s"n$t")): _*))
        .as[(String, Array[String])].collect()
        .iterator.flatMap { case (c, ns) =>
          ns.iterator.zipWithIndex.map { case (x, i) => ((c, i + 1), x) }
        }.toMap
      lap("collectWide")
      require(tableW == table,
        s"wide table differs: ${tableW.size} vs ${table.size}")
      lap("equalCheck")
      t0 = System.nanoTime()
      val rows = graft.graph.Algorithms.deterministicWalks(ug, length).count()
      lap(s"full(rows=$rows)")
    }
    spark.stop()
  }
}
