package graft

import org.apache.spark.sql.functions._

/** Scratch single-pass probe for the minhash pipeline at scale
  * corpora (not part of the library surface): one timed
  * minhashNearDups().count() with stage attribution, so a scale-rung
  * failure surfaces its real stack instead of dying inside the
  * bench's two-pass protocol. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    if (sys.env.get("MINHASH_PROBE_AB").contains("true")) {
      // ABBA same-JVM A/B: library pipeline (hybrid gate) vs the
      // pure inline-sh shape, to separate plan effects from window
      // noise at the scale rungs
      import graft.dedup.Dedup._
      import graft.plans.Materialize._
      val numHashes = 30; val bands = 6; val threshold = 0.8
      val r = numHashes / bands
      graft.functions.Registry.registerAll(spark)
      def pureInline(): Long = {
        val hashed = docs.select(col("doc_id").as("id"),
            array_sort(transform(tokenSet(col("text")), t => xxhash64(t))).as("sh"))
          .filter(col("sh").isNotNull)
          .withColumn("gk",
            md5(concat_ws(",", transform(col("sh"), x => x.cast("string")))))
        val members = hashed.select(col("id"), col("gk")).materialize()
        val reps = hashed.groupBy(col("gk"))
          .agg(min(col("id")).as("id"), first(col("sh")).as("sh"))
          .withColumn("sig", minhashSignature(col("sh"), numHashes))
          .select(col("gk"), col("id"), col("sh"), size(col("sh")).as("sz"),
            lshBands(col("sig"), bands, r).as("ba"))
          .materialize()
        val sigs = reps.select(col("id"), col("sz"), col("ba"), col("sh"),
          posexplode(col("ba")).as(Seq("band", "bucket")))
        val firstMatch = (1 until bands).foldLeft(
            when(col("x.band") === 0, lit(true))) { (acc, k) =>
          acc.when(col("x.band") === k,
            (0 until k).map(i => col("x.ba")(i) =!= col("y.ba")(i))
              .reduce(_ && _))
        }.otherwise(lit(false))
        val repPairs = sigs.as("x").join(sigs.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.id") < col("y.id"))
          .filter(least(col("x.sz"), col("y.sz")).cast("double")
            / greatest(col("x.sz"), col("y.sz")) >= threshold)
          .filter(firstMatch)
          .select(col("x.id").as("a"), col("y.id").as("b"),
            round(graft.functions.Registry.jaccardSorted(col("x.sh"), col("y.sh")), 4)
              .as("j"))
          .filter(col("j") >= threshold)
        val repOf = reps.select(col("id").as("rid"), col("gk"))
        val expand = members.join(repOf, "gk")
          .select(col("rid"), col("id")).materialize()
        val cross = repPairs
          .join(expand.select(col("rid").as("a"), col("id").as("ia")), "a")
          .join(expand.select(col("rid").as("b"), col("id").as("ib")), "b")
          .select(least(col("ia"), col("ib")).as("a"),
            greatest(col("ia"), col("ib")).as("b"), col("j"))
        val within = members.as("x").join(members.as("y"),
            col("x.gk") === col("y.gk") && col("x.id") < col("y.id"))
          .select(col("x.id").as("a"), col("y.id").as("b"), lit(1.0).as("j"))
        within.unionByName(cross).count()
      }
      def lib(): Long =
        minhashNearDups(docs, "doc_id", "text", threshold).count()
      for (leg <- Seq("lib", "pure", "pure", "lib")) {
        val t0 = System.nanoTime()
        val n = if (leg == "lib") lib() else pureInline()
        println(f"[minhash-ab] $leg pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    } else if (sys.env.get("MINHASH_PROBE_STAGES").contains("true")) {
      // stage dissection: inline copy of the minhashNearDups stages
      // (kept in sync by hand — scratch tool, not library surface)
      import graft.dedup.Dedup._
      import graft.plans.Materialize._
      val numHashes = 30; val bands = 6; val threshold = 0.8
      val r = numHashes / bands
      graft.functions.Registry.registerAll(spark)
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val v = f
        println(f"[minhash-stage] $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
        v
      }
      val hashed = docs.select(col("doc_id").as("id"),
          array_sort(transform(tokenSet(col("text")), t => xxhash64(t))).as("sh"))
        .filter(col("sh").isNotNull)
        .withColumn("gk",
          md5(concat_ws(",", transform(col("sh"), x => x.cast("string")))))
      val members = timed("members")(hashed.select(col("id"), col("gk")).materialize())
      val reps = timed("reps") {
        val f = hashed.groupBy(col("gk"))
          .agg(min(col("id")).as("id"), first(col("sh")).as("sh"))
          .withColumn("sig", minhashSignature(col("sh"), numHashes))
          .select(col("gk"), col("id"), col("sh"), size(col("sh")).as("sz"),
            lshBands(col("sig"), bands, r).as("ba"))
          .materialize()
        println(s"[minhash-stage] reps rows=${f.count()}")
        f
      }
      val sigs = reps.select(col("id"), col("sz"), col("ba"),
        posexplode(col("ba")).as(Seq("band", "bucket")))
      val firstMatch = (1 until bands).foldLeft(
          when(col("x.band") === 0, lit(true))) { (acc, k) =>
        acc.when(col("x.band") === k,
          (0 until k).map(i => col("x.ba")(i) =!= col("y.ba")(i))
            .reduce(_ && _))
      }.otherwise(lit(false))
      val cands = sigs.as("x").join(sigs.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.id") < col("y.id"))
        .filter(least(col("x.sz"), col("y.sz")).cast("double")
          / greatest(col("x.sz"), col("y.sz")) >= threshold)
        .filter(firstMatch)
        .select(col("x.id").as("a"), col("y.id").as("b"))
      timed("cands-count")(println(s"[minhash-stage] cands=${cands.count()}"))
      val sets = if (reps.count() <= setsBroadcastLimit) broadcast(reps) else reps
      val repPairs = cands
        .join(sets.select(col("id").as("a"), col("sh").as("sha")), "a")
        .join(sets.select(col("id").as("b"), col("sh").as("shb")), "b")
        .select(col("a"), col("b"),
          round(graft.functions.Registry.jaccardSorted(col("sha"), col("shb")), 4).as("j"))
        .filter(col("j") >= threshold)
      val rp = timed("verify")(repPairs.materialize())
      println(s"[minhash-stage] repPairs=${rp.count()}")
      val repOf = reps.select(col("id").as("rid"), col("gk"))
      val expand = timed("expand")(members.join(repOf, "gk")
        .select(col("rid"), col("id")).materialize())
      val cross = rp
        .join(expand.select(col("rid").as("a"), col("id").as("ia")), "a")
        .join(expand.select(col("rid").as("b"), col("id").as("ib")), "b")
        .select(least(col("ia"), col("ib")).as("a"),
          greatest(col("ia"), col("ib")).as("b"), col("j"))
      timed("cross-count")(println(s"[minhash-stage] cross=${cross.count()}"))
      val within = members.as("x").join(members.as("y"),
          col("x.gk") === col("y.gk") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b"), lit(1.0).as("j"))
      timed("within-count")(println(s"[minhash-stage] within=${within.count()}"))
    } else {
      val t0 = System.nanoTime()
      val n = graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text", 0.8)
        .count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[minhash-probe] dir=$dir pairs=$n wall=$t%.1fs")
    }
    spark.stop()
  }
}
