package graft

import org.apache.spark.sql.functions._
import graft.plans.Materialize._

/** Scratch A/B probe (not part of the library surface): classic
  * k-pass MinHash vs one-permutation (OPH) — per-stage timing and
  * candidate volume, to attribute any wall-clock difference to the
  * signature pass vs the banded join's bucket-collision mass. */
object OphProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).materialize()
    docs.count()
    for (oph <- Seq(false, true, false, true)) {
      val t0 = System.nanoTime()
      val sigs = graft.dedup.Dedup.signatures(
        docs, "doc_id", "text", 30, 6, oph)
      val n = sigs.count()
      val tSig = (System.nanoTime() - t0) / 1e9
      // same-bucket pair mass = the band join's output volume
      val t1 = System.nanoTime()
      val collide = sigs
        .select(posexplode(col("ba")).as(Seq("band", "bucket")))
        .groupBy("band", "bucket").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
        .head().getLong(0)
      val tBuckets = (System.nanoTime() - t1) / 1e9
      spark.conf.set("graft.minhash.oph", oph.toString)
      val t2 = System.nanoTime()
      val p = graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text", 0.8)
        .count()
      val tFull = (System.nanoTime() - t2) / 1e9
      println(s"[oph-probe] oph=$oph docs=$n sig=${f"$tSig%.2f"}s " +
        s"bucketPairs=$collide bucketAgg=${f"$tBuckets%.2f"}s " +
        s"fullPairs=$p full=${f"$tFull%.2f"}s")
    }
    spark.stop()
  }
}
