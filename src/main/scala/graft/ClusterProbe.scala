package graft

import org.apache.spark.sql.functions._

/** Scratch dissection + A/B probe (r13, not library surface): where
  * does g_clustering's wall go, and does a COLLISION-FREE dense-id
  * dictionary (unique longs from monotonically_increasing_id over
  * the materialized node list — not a hash, so no birthday risk; the
  * r12 xxhash64 rekeying was declined exactly for collisions) make
  * the m^1.5 wedge join cheaper than string corners?
  * ABBA legs, one JVM, wedge volume printed. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.plans.Materialize._

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // dissection: the bench key's pieces, cold derived state — the
    // overlay reconstructed like EgraphQueries.overlaidFor (private)
    val ue = t("overlay (undirected+chain)") {
      val supp = Tables.supplier(spark, dir).select(col("s_suppkey"))
      val chain = supp.as("x").join(supp.as("y"),
          col("y.s_suppkey") === col("x.s_suppkey") + 1)
        .select(concat(lit("s:"), col("x.s_suppkey").cast("string")).as("a"),
          concat(lit("s:"), col("y.s_suppkey").cast("string")).as("b"))
      val both = chain.unionByName(
        chain.select(col("b").as("a"), col("a").as("b")))
      val u = graft.graph.GraphBuilder.undirectedFor(spark, dir)
        .unionByName(both).materialize()
      u.count(); u
    }
    val deg = t("degrees") {
      val d = ue.select(col("a").as("node"))
        .unionByName(ue.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg")).materialize()
      d.count(); d
    }
    val aFirst = struct(col("da").as("d"), col("a").as("n")) <
      struct(col("db").as("d"), col("b").as("n"))
    val eStr = t("oriented edge build") {
      ue.filter(col("a") < col("b"))
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
          when(aFirst, col("b")).otherwise(col("a")).as("v"))
        .materialize()
    }
    println(s"[cluster-probe] |oriented edges| = ${eStr.count()}")
    // dense-id dictionary: unique longs, no collisions by construction
    val dict = t("dense-id dict build") {
      val d = ue.select(col("a").as("node")).distinct()
        .withColumn("nid", monotonically_increasing_id()).materialize()
      d.count(); d
    }
    val eLong = t("rekey edges to longs") {
      eStr.join(dict.select(col("node").as("u"), col("nid").as("ul")), "u")
        .join(dict.select(col("node").as("v"), col("nid").as("vl")), "v")
        .select(col("ul").as("u"), col("vl").as("v"))
        .materialize()
    }

    def wedgeCount(e: org.apache.spark.sql.DataFrame): Long = {
      val wedges = e.select(col("u"), col("v").as("w1"))
        .join(e.select(col("u"), col("v").as("w2")), "u")
        .filter(col("w1") < col("w2"))
      val canon = e.select(least(col("u"), col("v")).as("w1"),
        greatest(col("u"), col("v")).as("w2"))
      wedges.join(broadcast(canon), Seq("w1", "w2")).count()
    }
    def wedgeVolume(e: org.apache.spark.sql.DataFrame): Long =
      e.select(col("u"), col("v").as("w1"))
        .join(e.select(col("u"), col("v").as("w2")), "u")
        .filter(col("w1") < col("w2")).count()
    println(s"[cluster-probe] wedge volume = ${wedgeVolume(eStr)}")
    // EDGE-ITERATOR form: for each oriented edge (x,y), triangles
    // closing through it as the wedge's FIRST leg are
    // outN(x) ∩ outN(y) — orientation is consistent with one total
    // order, so each triangle x<y<z is found exactly once at edge
    // (x,y). No 12.5M-row wedge stream: one broadcast of the
    // out-neighbor arrays, map-side intersect per edge.
    def intersectCount(e: org.apache.spark.sql.DataFrame): Long = {
      val outN = e.groupBy(col("u")).agg(
        array_sort(collect_list(col("v"))).as("ns"))
      val cnt = e
        .join(broadcast(outN.select(col("u"), col("ns").as("nx"))), "u")
        .join(broadcast(outN.select(col("u").as("v"), col("ns").as("ny"))),
          Seq("v"), "left")
        .select(size(array_intersect(col("nx"),
          coalesce(col("ny"), array()))).as("c"))
        .agg(sum(col("c"))).head().getLong(0)
      cnt
    }
    // warm plans once
    wedgeCount(eStr); wedgeCount(eLong)
    intersectCount(eStr); intersectCount(eLong)
    for (leg <- Seq("str", "long", "ixl", "ixs", "ixs", "ixl", "long", "str",
        "str", "long", "ixl", "ixs")) {
      val t0 = System.nanoTime()
      val n = leg match {
        case "str" => wedgeCount(eStr)
        case "long" => wedgeCount(eLong)
        case "ixs" => intersectCount(eStr)
        case "ixl" => intersectCount(eLong)
      }
      println(f"[cluster-probe] keys=$leg triangles=$n wall=${
        (System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
